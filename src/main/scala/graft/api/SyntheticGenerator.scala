package graft.api

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TsSchema
import graft.ops.Scaling
import graft.providers.{FittedGenerator, GeneratorProvider}

/** Public generator facade — the reference's `TimeGanGenerator` /
  * `DoppleGangerGenerator` / `ParGenerator` construct-fit-generate-save
  * surface (paqarin/generator.py:65-98, README.md:42-89), provider chosen
  * by name exactly like `get_generator_adapter` (paqarin/adapter.py:64-97).
  *
  * fit: min-max scale the numeric columns (the reference's transformer,
  * ydata_adapter.py:217-237), then hand the scaled frame to the provider.
  * generate: provider sequences, inverse-scaled back to data space
  * (ydata_adapter.py:241-253), in the canonical long shape
  * `(seq_id, step, numericCols…)`.
  */
final class SyntheticGenerator(
    val provider: String,
    val schema: TsSchema,
    val seqLen: Int = 24) {

  private[api] var fitted: Option[FittedGenerator] = None
  private[api] var scaler: Option[Scaling.MinMaxStats] = None

  def fit(df: DataFrame): this.type = {
    val stats = Scaling.fit(df, schema.numericCols)
    scaler = Some(stats)
    fitted = Some(GeneratorProvider.forName(provider).fit(stats.transform(df), schema))
    this
  }

  /** Generate `n` sequences of `seqLen` rows; inverse-scaled. */
  def generate(spark: SparkSession, n: Int): DataFrame = {
    val model = fitted.getOrElse(
      throw new IllegalStateException("generate() before fit()"))
    scaler.get.inverse(model.generate(spark, n, seqLen))
  }

  /** Generate with a positional date index attached (J3,
    * doppleganger.py:176-179): step i of every sequence gets the i-th
    * date starting at `startDate`. */
  def generateWithDateIndex(spark: SparkSession, n: Int, startDate: String): DataFrame =
    generate(spark, n).withColumn(
      schema.tsCol,
      expr(s"date_add(DATE '$startDate', CAST(step AS INT))"))

  /** PAR-style context generation (reference: sdv_adapter.py:38-68 and
    * generate() at sdv_adapter.py:122-131): one sequence per context row,
    * with the context columns — the reference's `context_columns`, i.e.
    * per-sequence constants such as item ids or static covariates —
    * attached to every step of the matching generated sequence.
    *
    * Context rows are numbered deterministically by sorting on all context
    * columns (the reference relies on the context frame's row order, which
    * has no distributed equivalent). The attach is a broadcast join: the
    * context is by construction #sequences rows — dim-sized relative to
    * the generated steps. Context column names must not collide with the
    * generated schema (`seq_id`, `step`, the numeric columns).
    */
  def generateWithContext(spark: SparkSession, context: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val generatedCols = "seq_id" +: "step" +: schema.numericCols
    val collisions = context.columns.intersect(generatedCols)
    require(collisions.isEmpty,
      s"context columns ${collisions.mkString(", ")} collide with the " +
        "generated schema (seq_id, step, numeric columns) — rename them")
    val n = context.count()
    require(n <= 1000000L,
      s"context has $n rows; one sequence is generated per row — cap is 1e6")
    val ordered = context.withColumn(
      "seq_id",
      (row_number().over(
        Window.orderBy(context.columns.toIndexedSeq.map(col): _*)) - 1).cast("long"))
    generate(spark, n.toInt).join(broadcast(ordered), "seq_id")
  }

  /** S4/S5 — persist the fitted transformer + provider state as JSON
    * (scaling stats are 2 doubles per column; statistical-provider state is
    * mean/std per column). Mirrors evaluation.py:244-255's pickle sink. */
  def save(path: String): Unit = {
    val stats = scaler.getOrElse(
      throw new IllegalStateException("save() before fit()"))
    val model = fitted.get
    val scalerJson = schema.numericCols
      .map(c => s""""$c":[${stats.stats(c)._1},${stats.stats(c)._2}]""")
      .mkString("{", ",", "}")
    val json =
      s"""{"provider":"$provider","seqLen":$seqLen,
         |"itemIdCols":[${schema.itemIdCols.map("\"" + _ + "\"").mkString(",")}],
         |"tsCol":"${schema.tsCol}",
         |"numericCols":[${schema.numericCols.map("\"" + _ + "\"").mkString(",")}],
         |"catCols":[${schema.catCols.map("\"" + _ + "\"").mkString(",")}],
         |"scaler":$scalerJson}""".stripMargin
    Files.createDirectories(Paths.get(path))
    Files.writeString(Paths.get(path, "generator.json"), json)
    // parametric provider state (incl. categorical frequencies) is plain
    // data — serialize the whole Model; out-of-process models persist the
    // worker's opaque blob as model.json (the blob IS the state; the
    // matching provider's `rehydrate` re-wraps it on load); non-parametric
    // providers (whose state is a DataFrame) skip the file and must be
    // re-fit after load
    model match {
      case m @ (_: graft.providers.StatisticalProvider.Model |
                _: graft.providers.ArProvider.Model) =>
        val oos = new java.io.ObjectOutputStream(
          Files.newOutputStream(Paths.get(path, "model.bin")))
        try oos.writeObject(m) finally oos.close()
      case pf: graft.providers.ProcessProvider#ProcessFitted =>
        Files.writeString(Paths.get(path, "model.json"),
          org.json4s.jackson.JsonMethods.compact(
            org.json4s.jackson.JsonMethods.render(pf.modelJson)))
      case _ => ()
    }
  }
}

object SyntheticGenerator {

  def apply(provider: String, schema: TsSchema, seqLen: Int = 24): SyntheticGenerator =
    new SyntheticGenerator(provider, schema, seqLen)

  /** Reload a saved statistical generator (S4/S5 scan side). */
  def load(path: String): SyntheticGenerator = {
    val json = Files.readString(Paths.get(path, "generator.json"))
    def field(name: String): String = {
      val m = ("\"" + name + "\":(\\[[^\\]]*\\]|\\{[^}]*\\}|\"[^\"]*\"|[0-9.]+)").r
      m.findFirstMatchIn(json).map(_.group(1)).getOrElse(
        throw new IllegalArgumentException(s"missing $name in $path"))
    }
    def strings(arr: String): Seq[String] =
      "\"([^\"]*)\"".r.findAllMatchIn(arr).map(_.group(1)).toSeq
    def numPairs(obj: String): Map[String, (Double, Double)] =
      "\"([^\"]+)\":\\[([-0-9.eE]+),([-0-9.eE]+)\\]".r.findAllMatchIn(obj)
        .map(m => m.group(1) -> (m.group(2).toDouble, m.group(3).toDouble)).toMap
    val schema = TsSchema(
      strings(field("itemIdCols")),
      field("tsCol").stripPrefix("\"").stripSuffix("\""),
      strings(field("numericCols")),
      // tolerate checkpoints written before catCols was persisted
      if (json.contains("\"catCols\":")) strings(field("catCols")) else Nil)
    val gen = new SyntheticGenerator(
      field("provider").stripPrefix("\"").stripSuffix("\""),
      schema, field("seqLen").toDouble.toInt)
    gen.scaler = Some(Scaling.MinMaxStats(numPairs(field("scaler"))))
    if (json.contains("\"providerState\":"))
      throw new IllegalArgumentException(
        s"$path was written by a pre-model.bin format; re-save the generator")
    val modelBin = Paths.get(path, "model.bin")
    val modelJson = Paths.get(path, "model.json")
    if (Files.exists(modelBin)) {
      val ois = new java.io.ObjectInputStream(Files.newInputStream(modelBin))
      try gen.fitted = Some(
        ois.readObject().asInstanceOf[graft.providers.FittedGenerator])
      finally ois.close()
    } else if (Files.exists(modelJson)) {
      // out-of-process blob: the matching provider must already be
      // registered (the worker command is deliberately not persisted)
      val provider = GeneratorProvider.forName(gen.provider)
      gen.fitted = Some(provider.rehydrate(Files.readString(modelJson))
        .getOrElse(throw new IllegalArgumentException(
          s"provider '${gen.provider}' cannot rehydrate $modelJson — " +
            "register the matching out-of-process provider before load()")))
    }
    gen
  }
}
