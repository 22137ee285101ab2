package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** The round-4 posting-list pair rework (no self-join, similarity before
  * the cross-band dedup) must be ROW-IDENTICAL to the self-join forms the
  * oracles validated for three rounds. The oracles pin three fixed SFs;
  * this spec pins randomized adversarial shapes — empty docs, single
  * tokens, exact duplicates, caps small enough to actually drop.
  */
class PairEquivalenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomCorpus(seed: Int, n: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    val docs = (0 until n).map { i =>
      val len = rnd.nextInt(16) // includes 0 → empty text
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // exact duplicates with fresh ids: guaranteed shared shingles
    val dups = docs.take(5).map { case (id, t) => (id + 1000L, t) }
    (docs ++ dups).toDF("doc_id", "text")
  }

  /** The pre-round-4 ngram formulation: freq-capped self-equi-join on the
    * shingle hash + sizes join-back (hints/metrics omitted — they never
    * changed output). */
  private def ngramOld(df: DataFrame, n: Int, threshold: Double,
      maxDocFreq: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val grams = df.select(col("doc_id"),
      explode(GraftColumnBridge.column(graft.functions.XxHash64Array(
        GraftColumnBridge.expression(
          Dedup.wordNgrams(col("text"), n))))).as("__g"))
    val freqs = grams.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
    val kept = grams.join(freqs, "__g")
      .filter(col("__df") <= maxDocFreq).drop("__df")
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("__n"))
    val a = kept.select(col("doc_id").as("id_a"), col("__g"))
    val b = kept.select(col("doc_id").as("id_b"), col("__g"))
    a.join(b, "__g").filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("__shared"))
      .join(sizes.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("__n", "__na"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("__n", "__nb"), "id_b")
      .withColumn("jaccard", col("__shared").cast("double")
        / (col("__na") + col("__nb") - col("__shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  test("ngramJaccardPairs == pre-rework self-join form on random corpora") {
    for (seed <- Seq(7, 19); (thr, cap) <- Seq((0.1, 1000), (0.3, 4))) {
      val df = randomCorpus(seed, 60)
      val got = Dedup.ngramJaccardPairs(df, "doc_id", "text", 2, thr, cap)
        .orderBy("id_a", "id_b").as[(Long, Long, Double)].collect().toSeq
      val want = ngramOld(df, 2, thr, cap)
        .orderBy("id_a", "id_b").as[(Long, Long, Double)].collect().toSeq
      assert(got == want, s"seed=$seed thr=$thr cap=$cap")
      // the cap=4 configs must actually exercise dropping, or they test
      // nothing. NOTE the result need not SHRINK: capped Jaccard is
      // computed over the kept shingle space on both sides of the ratio,
      // so dropping common shingles can make surviving docs look MORE
      // similar — only set inequality is guaranteed here (tiny vocab +
      // exact dups ⇒ stop-shingles exist).
      if (cap == 4) {
        val uncapped = Dedup
          .ngramJaccardPairs(df, "doc_id", "text", 2, thr, 100000)
          .orderBy("id_a", "id_b").as[(Long, Long, Double)].collect().toSeq
        assert(got != uncapped)
      }
    }
  }

  /** The pre-round-4 portable-minhash pair formulation: banded
    * self-equi-join carrying both signatures + zip_with agreement. */
  private def minhashOld(df: DataFrame, threshold: Double): DataFrame = {
    val k = Dedup.PortableCoeffs.length
    val bands = 2
    val rowsPerBand = k / bands
    val sigArr = array((0 until k).map(i => col(s"minhash_$i")): _*)
    val sigs = Dedup.minHashSignaturesPortable(df, "doc_id", "text")
      .select(col("doc_id"), sigArr.as("__sig"))
    val withBands = sigs.select(col("doc_id"), col("__sig"),
      explode(array((0 until bands).map(b => struct(
        lit(b).as("band_idx"),
        xxhash64(slice(col("__sig"), b * rowsPerBand + 1, rowsPerBand))
          .as("band_hash"))): _*)).as("__band"))
      .select(col("doc_id"), col("__sig"),
        col("__band.band_idx"), col("__band.band_hash"))
    val a = withBands.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("id_a"), col("__sig").as("sig_a"))
    val b = withBands.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("id_b"), col("__sig").as("sig_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        round(size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), m => m)).cast("double") / lit(k.toDouble), 6)
          .as("sig_similarity"))
      .filter(col("sig_similarity") >= threshold)
  }

  test("minHashNearDuplicatesPortable == pre-rework self-join form on random corpora") {
    for (seed <- Seq(11, 29); thr <- Seq(0.5, 0.75)) {
      val df = randomCorpus(seed, 60)
      val got = Dedup.minHashNearDuplicatesPortable(df, "doc_id", "text", thr)
        .orderBy("id_a", "id_b").as[(Long, Long, Double)].collect().toSeq
      val want = minhashOld(df, thr)
        .orderBy("id_a", "id_b").as[(Long, Long, Double)].collect().toSeq
      assert(got == want, s"seed=$seed thr=$thr")
      assert(got.nonEmpty) // exact dups guarantee sim-1.0 pairs survive
    }
  }
}
