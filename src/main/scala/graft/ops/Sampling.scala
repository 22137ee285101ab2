package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `TABLESAMPLE` / `df.sample` are seed-dependent AND partition-dependent —
  * the same seed yields different rows after a repartition, which makes
  * pipeline reruns non-reproducible at scale. Hash-gating on a stable key
  * (`hash(key) mod granularity < rate`) is partition-independent,
  * cluster-size-independent, and joins consistently across tables sampled
  * on the same key (the standard trick for coherent multi-table samples).
  * It is a pure map-side filter: no shuffle, pushes through scans as a
  * deterministic predicate.
  */
object Sampling {

  /** Production path: xxhash64-gated sample keeping ~`percent`% of rows. */
  def hashSample(df: DataFrame, keyCol: Column, percent: Int): DataFrame =
    df.filter(productionGate(keyCol) < percent)

  private def productionGate(keyCol: Column): Column =
    pmod(xxhash64(keyCol), lit(100))

  /** Cross-engine-portable variant: first 8 md5 hex digits as the gate hash
    * (same idiom as [[graft.ext.Dedup.simHashPortable]]) so the sampled set
    * is reproducible in any engine with md5 — and hence oracle-checkable.
    * Slower than [[hashSample]]; use for cross-engine reconciliation. */
  def hashSamplePortable(df: DataFrame, keyCol: Column, percent: Int): DataFrame =
    df.filter(portableGate(keyCol) < percent)

  private def portableGate(keyCol: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    // native kernel ≡ conv(substring(md5(s), 1, 8), 16, 10) — same md5
    // bytes, digit value read off the digest instead of materializing and
    // re-parsing the 32-char hex string per row (bit-identical, and the
    // DuckDB oracles keep recomputing the expression form)
    GraftColumnBridge.column(graft.functions.Md5PrefixLong(
      GraftColumnBridge.expression(keyCol.cast("string")), 8)) % 100
  }

  /** Stratified sample: a different keep-percentage per stratum value
    * (e.g. downsample boilerplate-heavy sources harder than rare ones).
    * Still a pure map-side filter — the rate table compiles into a CASE
    * chain, so there is no join and no shuffle; the same key hashes to
    * the same gate in every stratum, keeping cross-strata samples
    * coherent. Production gate = xxhash64; `portable = true` uses the
    * md5 gate for cross-engine reconciliation. */
  def stratifiedSample(
      df: DataFrame,
      keyCol: Column,
      strataCol: Column,
      rates: Seq[(String, Int)],
      defaultPercent: Int,
      portable: Boolean = false): DataFrame = {
    val gate = if (portable) portableGate(keyCol) else productionGate(keyCol)
    val pct = rates.foldRight(lit(defaultPercent): Column) {
      case ((v, p), rest) => when(strataCol === v, p).otherwise(rest)
    }
    df.filter(gate < pct)
  }
}
