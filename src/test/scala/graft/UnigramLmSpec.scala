package graft

import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextAnalysis

/** Unigram LM quality scoring (fitUnigramModel / scoreUnigram /
  * UnigramLogProbStats): hand-computed model and scores on a fixed tiny
  * corpus, OOV accounting, empty-document behavior, vocabulary-cutoff
  * tie-break, and the no-shuffle plan. */
class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // token counts: a=4, b=3, c=2, d=1  (total 10)
  private def corpus = Seq(
    (1L, "a a b c"),
    (2L, "a b d"),
    (3L, "a b c")
  ).toDF("doc_id", "text")

  test("fit: hand-computed add-1 probabilities and OOV mass") {
    val m = TextAnalysis.fitUnigramModel(corpus, "text", vocabSize = 2)
    // vocab = top-2 by (count desc, token asc): a(4), b(3); V=2,
    // denom = 10 + 1*(2+1) = 13
    assert(m.totalTokens == 10L)
    assert(m.logProbs.map(_._1) == Seq("a", "b"))
    assert(m.logProbs.toMap.apply("a") === math.log(5.0 / 13))
    assert(m.logProbs.toMap.apply("b") === math.log(4.0 / 13))
    assert(m.oovLogProb === math.log(1.0 / 13))
  }

  test("score: per-doc sums, OOV counts, and mean log-probability") {
    val m = TextAnalysis.fitUnigramModel(corpus, "text", vocabSize = 2)
    val rows = TextAnalysis.scoreUnigram(corpus, "text", m)
      .select("doc_id", "sum_lp", "n_tok", "n_oov", "avg_lp")
      .as[(Long, Double, Int, Int, Option[Double])]
      .collect().sortBy(_._1)
    val (la, lb, loov) =
      (math.log(5.0 / 13), math.log(4.0 / 13), math.log(1.0 / 13))
    // doc 1: a a b c -> 2*la + lb + oov, 4 tokens, 1 oov
    assert(rows(0)._2 === 2 * la + lb + loov +- 1e-12)
    assert((rows(0)._3, rows(0)._4) == ((4, 1)))
    assert(rows(0)._5.get === (2 * la + lb + loov) / 4 +- 1e-12)
    // doc 2: a b d -> la + lb + oov, 3 tokens, 1 oov
    assert(rows(1)._2 === la + lb + loov +- 1e-12)
    assert((rows(1)._3, rows(1)._4) == ((3, 1)))
  }

  test("empty and whitespace-only docs score zero tokens, null mean") {
    val m = TextAnalysis.fitUnigramModel(corpus, "text", vocabSize = 2)
    val edge = Seq((10L, ""), (11L, "   "), (12L, " a ")).toDF("doc_id", "text")
    val rows = TextAnalysis.scoreUnigram(edge, "text", m)
      .select("doc_id", "n_tok", "n_oov", "avg_lp")
      .as[(Long, Int, Int, Option[Double])].collect().sortBy(_._1)
    assert(rows(0) == ((10L, 0, 0, None)))
    assert(rows(1) == ((11L, 0, 0, None)))
    assert(rows(2)._2 == 1 && rows(2)._4.isDefined)
  }

  test("vocabulary cutoff breaks count ties lexicographically") {
    // b and c both have count 2: vocabSize=2 must keep a (3) and b
    val tied = Seq((1L, "a a a b b c c")).toDF("doc_id", "text")
    val m = TextAnalysis.fitUnigramModel(tied, "text", vocabSize = 2)
    assert(m.logProbs.map(_._1) == Seq("a", "b"))
  }

  test("fit: reads the corpus exactly once (counting filter)") {
    // every actual scan of the source evaluates this filter once per row;
    // with the counts frame checkpointed, the top-k job materializes it
    // and the token-total aggregate reads the blocks — 3 rows, one pass
    val acc = spark.sparkContext.longAccumulator("fit-scan-rows")
    val tick = udf { (_: String) => { acc.add(1); true } }
    val m = TextAnalysis.fitUnigramModel(
      corpus.filter(tick(col("text"))), "text", vocabSize = 2)
    assert(m.totalTokens == 10L)
    assert(acc.value == 3L,
      s"fit scanned ${acc.value} rows-worth of corpus for 3 rows — " +
        "the token total must derive from the counts frame, not a second scan")
  }

  test("plan: scoring is map-only — no exchange touches the corpus") {
    val m = TextAnalysis.fitUnigramModel(corpus, "text", vocabSize = 2)
    val df = TextAnalysis.scoreUnigram(corpus, "text", m)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"unigram scoring leaked a shuffle:\n$plan")
  }

  test("perplexityBuckets: tertile partition, score-ordered, null for " +
      "token-less docs; final plan reads the checkpoint without re-scoring") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(5)
    val docs = ((0L until 90L).map { i =>
      // three fluency tiers: common words, mixed, rare-only
      val t = i % 3 match {
        case 0 => Seq.fill(20)("the")
        case 1 => Seq.fill(10)("the") ++ Seq.fill(10)("rare" + rnd.nextInt(50))
        case _ => Seq.fill(20)("rare" + rnd.nextInt(50))
      }
      (i, t.mkString(" "))
    } :+ (1000L, "")).toDF("doc_id", "text")
    val model = TextAnalysis.fitUnigramModel(docs, "text", 8, 1.0)
    val out = TextAnalysis.perplexityBuckets(docs, "doc_id", "text", model)
    val rows = out.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)),
      if (r.isNullAt(2)) None else Some(r.getString(2))))
    // token-less doc: null score, null bucket
    val empty = rows.find(_._1 == 1000L).get
    assert(empty._2.isEmpty && empty._3.isEmpty)
    val byBucket = rows.filter(_._3.isDefined)
      .groupBy(_._3.get).view.mapValues(_.map(_._2.get)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // strict ordering: every head score > every middle score > every tail
    assert(byBucket("head").min >= byBucket("middle").max)
    assert(byBucket("middle").min >= byBucket("tail").max)
    // roughly a third each (ties can skew the exact split)
    byBucket.values.foreach(v => assert(v.length >= 15 && v.length <= 45))
    // one-pass contract: the serving plan reads the checkpointed narrow
    // frame and contains no scoring kernel and no join
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("Scan ExistingRDD"),
      s"perplexityBuckets does not read a materialized score frame:\n$p")
    assert(!p.contains("unigramlogprobstats"),
      s"perplexityBuckets re-scores in its final plan:\n$p")
    assert(!p.toLowerCase.contains("join"),
      s"perplexityBuckets grew a threshold join:\n$p")
  }
}
