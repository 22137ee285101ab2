package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, TextAnalysis, UrlOps}
import graft.ext.TextAnalysis.GopherThresholds

/** Unit specs for the rule-based curation gates (Gopher document rules,
  * C4 line cleaning), the temperature-weighted mixture, the domain-level
  * quality gate and the n-gram overlap pairs. Cross-engine values are
  * pinned by the `text_gopher` / `text_c4` / `text_mixture_temp` /
  * `url_domain_gate` / `dedup_containment` oracles; these specs pin the
  * SEMANTICS (boundaries, null handling, drops) and each stage's plan
  * shape.
  */
class RuleGatesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ——— Gopher rules ———

  test("gopherFeatures: counts and ratios on a seeded multi-line doc") {
    val text = "the cat sat on a mat ### ...\n- bullet item\nto be continued...\n  \nplain line"
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextAnalysis.gopherFeatures(df, "text").head()
    // tokens: the cat sat on a mat ### ... | - bullet item |
    // to be continued... | plain line  => 16 words
    assert(r.getAs[Int]("n_words") == 16)
    // lines with content: 4 (the blank "  " line doesn't count)
    assert(r.getAs[Int]("n_lines") == 4)
    // one bullet line of 4; one ellipsis-terminated line of 4 — the
    // first line's "..." is mid-text padding, not a line terminator...
    // wait: line 1 ends with "..." too
    assert(r.getAs[Double]("bullet_line_frac") == 1.0 / 4)
    assert(r.getAs[Double]("ellipsis_line_frac") == 2.0 / 4)
    // symbols: ### = 3 hashes, plus two "..." occurrences
    assert(r.getAs[Double]("symbol_ratio") == 5.0 / 16)
    // non-alpha tokens: "###", "...", "-" => 13 alpha of 16
    assert(r.getAs[Double]("alpha_word_frac") == 13.0 / 16)
    // stopwords: the, on, a, to, be  => "be" is not in the list; the/on/a/to...
    // list = the,a,an,of,and,to,in,is => hits: the, a, to = 3
    assert(r.getAs[Int]("n_stop") == 3)
  }

  test("gopherQuality: word-less doc fails every ratio rule, not NPEs") {
    val df = Seq((1L, ""), (2L, "   "), (3L,
      "the quick brown fox jumps over a lazy dog and runs far away home"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherQuality(df, "text",
        GopherThresholds(minWords = 5, minStopHits = 2))
      .select("doc_id", "gopher_pass").as[(Long, Boolean)].collect().toMap
    assert(!got(1L) && !got(2L))
    assert(got(3L)) // 14 words, mean len in range, 0 symbols, all alpha
  }

  test("gopherQuality boundary: thresholds are inclusive") {
    // exactly minWords words, all alphabetic, stop hits exactly minStopHits
    val df = Seq((1L, "the cat and dog sat")).toDF("doc_id", "text")
    val got = TextAnalysis.gopherQuality(df, "text",
      GopherThresholds(minWords = 5, maxWords = 5,
        minMeanWordLen = 1.0, maxMeanWordLen = 10.0,
        minStopHits = 2)).head()
    assert(got.getAs[Boolean]("pass_words"))
    assert(got.getAs[Boolean]("pass_stop"))
    assert(got.getAs[Boolean]("gopher_pass"))
  }

  test("gopherFeatures guards column collisions; plans map-only") {
    val df = Seq((1L, "x", 2)).toDF("doc_id", "text", "n_words")
    intercept[IllegalArgumentException] {
      TextAnalysis.gopherFeatures(df, "text")
    }
    val plan = TextAnalysis.gopherQuality(
        Seq((1L, "a b c")).toDF("doc_id", "text"), "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gopher gate shuffles:\n$plan")
    assert(!plan.contains("Generate"), s"gopher gate explodes:\n$plan")
  }

  // ——— C4 line cleaning ———

  test("c4Clean: line rules (terminal punctuation + min words) and doc drops") {
    val keepable = "This line has five good words."
    val docs = Seq(
      // two keepable lines -> survives; short/unpunctuated lines removed
      (1L, s"$keepable\ntiny line.\nno punctuation here at all\n$keepable"),
      // lorem ipsum mention -> dropped whole
      (2L, s"$keepable\n$keepable\ncontains lorem ipsum right here."),
      // curly brace -> dropped whole
      (3L, s"$keepable\n$keepable\nif (x) { return; }"),
      // only one keepable line -> below minLines -> dropped
      (4L, s"$keepable\nnothing else survives here")
    ).toDF("doc_id", "text")
    val cleaned = TextAnalysis.c4Clean(docs, "text",
      minLineWords = 5, minLines = 2)
    val byId = cleaned.select("doc_id", "n_lines_kept", "clean")
      .as[(Long, Int, String)].collect()
    assert(byId.map(_._1).toSet == Set(1L))
    val (_, nKept, clean) = byId.head
    assert(nKept == 2)
    assert(clean == s"$keepable\n$keepable")
  }

  test("c4Clean: quote-terminated lines kept; ellipsis is not terminal") {
    val docs = Seq(
      (1L, "He said it was \"entirely fine today.\"\nAnd this one also keeps its period.\nbut this one trails off with more..")
    ).toDF("doc_id", "text")
    // "..." ends with '.', so it IS terminal by the published rule —
    // the third line fails only if under minLineWords; here it has 7
    // words and ends in '.', so all three lines survive
    val got = TextAnalysis.c4Clean(docs, "text", minLineWords = 5, minLines = 1)
      .select("n_lines_kept").as[Int].head()
    assert(got == 3)
  }

  test("c4Clean guards and map-only plan") {
    val df = Seq((1L, "a.")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.c4Clean(df.withColumn("clean", lit("x")), "text")
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.c4Clean(df, "text", minLineWords = 0)
    }
    val plan = TextAnalysis.c4Clean(df, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"c4 gate shuffles:\n$plan")
    assert(!plan.contains("Join"), s"c4 gate joins:\n$plan")
  }

  // ——— temperature mixture ———

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Plain-Scala replay of the documented temperature-budget semantics:
    * integerized weights, left-associated double arithmetic, naive
    * per-group cumulative prefix. */
  private def tempModel(
      docs: Seq[(Long, String, Int)], alpha: Double, bf: Double,
      seed: String): Set[(Long, String, Int)] = {
    val totals = docs.groupBy(_._2).view
      .mapValues(_.map(_._3.toLong).sum).toMap
    if (totals.isEmpty) return Set.empty
    val weights = totals.view.mapValues(t =>
      math.floor(math.pow(t.toDouble, alpha))).toMap
    val tot = totals.values.sum.toDouble
    val den = weights.values.sum
    docs.groupBy(_._2).flatMap { case (g, members) =>
      val budget = math.floor(bf * tot * weights(g) / den).toLong
      var cum = 0L
      members.sortBy { case (id, _, _) => (md5hex(s"$id:$seed"), id) }
        .flatMap { case (id, gg, n) =>
          cum += n
          if (cum <= budget) Some((id, gg, n)) else None
        }
    }.toSet
  }

  test("mixtureByTemperature == naive integerized-weight model") {
    val docs = (0 until 60).map { i =>
      val g = if (i % 6 == 0) "lo" else if (i % 3 == 0) "mid" else "en"
      (i.toLong, g, (i * 7) % 13) // includes zero-token docs
    }
    val df = docs.map { case (id, g, w) =>
      (id, g, Seq.fill(w)("w").mkString(" ")) }.toDF("doc_id", "lang", "text")
    for (alpha <- Seq(0.5, 0.7, 1.0); buckets <- Seq(1, 7, 64)) {
      val got = TextAnalysis.mixtureByTemperature(
          df, "doc_id", "lang", "text",
          alpha = alpha, budgetFraction = 0.5, seed = "42",
          numBuckets = buckets)
        .as[(Long, String, Int)].collect().toSet
      assert(got == tempModel(docs, alpha, 0.5, "42"),
        s"alpha=$alpha buckets=$buckets")
    }
  }

  test("mixtureByTemperature: alpha<1 upweights the low-resource group") {
    // en: 40 docs x 10 tokens; lo: 5 docs x 10 tokens
    val docs = ((0 until 40).map(i => (i.toLong, "en", 10)) ++
      (40 until 45).map(i => (i.toLong, "lo", 10)))
    val df = docs.map { case (id, g, w) =>
      (id, g, Seq.fill(w)("w").mkString(" ")) }.toDF("doc_id", "lang", "text")
    def kept(alpha: Double): Map[String, Long] =
      TextAnalysis.mixtureByTemperature(df, "doc_id", "lang", "text",
          alpha, 0.5, numBuckets = 8)
        .groupBy("lang").count().as[(String, Long)].collect().toMap
    val flat = kept(0.5)
    val prop = kept(1.0)
    // proportional: lo gets ~0.5 of its 5 docs; flattened: more of lo
    // survives (budget exceeds the group) while en gives up share
    assert(flat.getOrElse("lo", 0L) > prop.getOrElse("lo", 0L))
    assert(flat.getOrElse("en", 0L) < prop.getOrElse("en", 0L))
    // upsampled group budget CAPS at available data
    assert(flat.getOrElse("lo", 0L) <= 5L)
  }

  test("mixtureByTemperature rejects out-of-range parameters") {
    val df = Seq((1L, "en", "a")).toDF("doc_id", "lang", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.mixtureByTemperature(df, "doc_id", "lang", "text",
        alpha = 0.0, budgetFraction = 0.5)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.mixtureByTemperature(df, "doc_id", "lang", "text",
        alpha = 0.5, budgetFraction = 1.5)
    }
  }

  // ——— domain quality gate ———

  test("dropLowQualityDomains: below-mean domains dropped, null URLs kept") {
    val df = Seq(
      (1L, "https://good.com/a", 0.9),
      (2L, "https://good.com/b", 0.7),   // mean 0.8 -> kept
      (3L, "https://www.bad.com/a", 0.1),
      (4L, "https://cdn.bad.com/b", 0.3), // mean 0.2 -> dropped
      (5L, "not a url", 0.05),            // null domain -> kept
      (6L, "https://edge.com/x", 0.5)     // mean 0.5, threshold 0.5 -> kept
    ).toDF("doc_id", "url", "score")
    val got = UrlOps.dropLowQualityDomains(df, "url", "score", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 5L, 6L))
  }

  test("domain gate plan: broadcast anti-join, corpus side exchange-free") {
    val df = Seq((1L, "https://a.com/x", 0.5)).toDF("doc_id", "url", "score")
    val gated = UrlOps.dropLowQualityDomains(df, "url", "score", 0.5)
    gated.collect() // materialize under AQE before reading the final plan
    val plan = gated.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"gate is not a broadcast anti-join:\n$plan")
    // the only exchanges allowed feed the BAD-set aggregate (narrow
    // domain/score rows) and its broadcast — never the corpus branch;
    // the corpus side of an anti-join is the streamed side, which in
    // this plan reads the scan directly
    assert(!plan.contains("SortMergeJoin"), s"corpus side shuffled:\n$plan")
  }

  // ——— n-gram overlap pairs ———

  test("ngramOverlapPairs: containment of a short doc in a long one") {
    val quote = "alpha beta gamma delta epsilon"   // 3 trigrams
    val long = s"intro words here $quote trailing tail words end"
    val df = Seq((1L, quote), (2L, long)).toDF("doc_id", "text")
    val rows = Dedup.ngramOverlapPairs(df, "doc_id", "text", 3, 0.5)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.length == 1)
    val (a, b, overlap, ca, cb) = rows.head
    assert((a, b) == (1L, 2L))
    assert(overlap == 1.0)       // every quote trigram appears in long
    assert(ca == 1.0)            // containment of A (the quote) in B
    assert(cb < 1.0)             // but B is not contained in A
    // and Jaccard on the same pair is strictly smaller than overlap
    val j = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.01)
      .as[(Long, Long, Double)].collect().head._3
    assert(j < overlap)
  }

  test("ngramOverlapPairs: threshold filters; sub-threshold pairs absent") {
    val df = Seq(
      (1L, "a b c d e"), (2L, "a b c x y"), (3L, "p q r s t"))
      .toDF("doc_id", "text")
    // docs 1,2 share exactly one trigram "a b c" of 3 each -> overlap 1/3
    val hi = Dedup.ngramOverlapPairs(df, "doc_id", "text", 3, 0.5)
      .count()
    val lo = Dedup.ngramOverlapPairs(df, "doc_id", "text", 3, 0.3)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(hi == 0)
    assert(lo.length == 1 && lo.head._3 == 1.0 / 3)
  }
}
