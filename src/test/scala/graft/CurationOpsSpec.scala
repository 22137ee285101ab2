package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextAnalysis

/** Unit specs for the round-6 curation additions: unicode/whitespace
  * normalization, fixed-token context-window chunking, and CCNet-style
  * boilerplate-line removal. The cross-engine values are pinned by the
  * `text_normalize` / `text_chunks` / `text_boilerplate` oracles; these
  * specs pin the SEMANTICS (boundaries, survivors, guards) and the
  * map-only plan shape of each rewrite stage.
  */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ——— unicode normalization ———

  test("unicodeNormalize composes decomposed sequences (NFC)") {
    val df = Seq("Café", "plain ascii", "édja NFC").toDF("t")
    val got = df.select(TextAnalysis.unicodeNormalize(col("t")))
      .as[String].collect()
    assert(got(0) == "Café") // e + COMBINING ACUTE -> precomposed
    assert(got(1) == "plain ascii") // isNormalized fast path: identity
    assert(got(2) == "édja NFC")
  }

  test("unicodeNormalize NFKC folds compatibility forms; bad form rejected") {
    val df = Seq("ﬁle ①").toDF("t") // fi-ligature, circled one
    assert(df.select(TextAnalysis.unicodeNormalize(col("t"), "NFKC"))
      .as[String].head() == "file 1")
    intercept[IllegalArgumentException] {
      TextAnalysis.unicodeNormalize(col("t"), "NFX")
    }
  }

  test("normalizeText: NFC + lower + whitespace collapse + trim") {
    val df = Seq("  Café   du\t\nMonde  ", "", "ONE").toDF("t")
    val got = df.select(TextAnalysis.normalizeText(col("t")))
      .as[String].collect()
    assert(got(0) == "café du monde")
    assert(got(1) == "")
    assert(got(2) == "one")
  }

  // ——— fixed-token chunking ———

  test("chunkByTokens: overlapping windows, short trailing chunk") {
    // 10 tokens, size 4, stride 3 -> offsets 0,3,6,9; last chunk is 1 token
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(df, "text", chunkSize = 4, stride = 3)
      .orderBy("chunk_id")
      .select("chunk_id", "n_tok", "chunk_text")
      .as[(Int, Int, String)].collect()
    assert(got.toSeq == Seq(
      (0, 4, "t1 t2 t3 t4"),
      (1, 4, "t4 t5 t6 t7"),
      (2, 4, "t7 t8 t9 t10"),
      (3, 1, "t10")))
  }

  test("chunkByTokens: non-overlapping when stride == chunkSize; " +
      "zero-token docs yield no chunks; whitespace normalized") {
    val df = Seq(
      (1L, "a  b \t c d e"), // messy whitespace, 5 tokens
      (2L, "   "), // zero tokens -> no rows
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(df, "text", chunkSize = 2, stride = 2)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Int, String)].collect()
    assert(got.toSeq == Seq(
      (1L, 0, "a b"), (1L, 1, "c d"), (1L, 2, "e")))
  }

  test("chunkByTokens guards: bad params and column collisions rejected") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkByTokens(df, "text", chunkSize = 0, stride = 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkByTokens(df, "text", chunkSize = 2, stride = 0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkByTokens(
        df.withColumn("chunk_id", lit(1)), "text", 2, 2)
    }
  }

  test("chunkByTokens plans map-only: no exchange, no window") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.chunkByTokens(df, "text", 64, 48)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking shuffles:\n$plan")
    assert(!plan.contains("Window"), s"chunking plans a window:\n$plan")
  }

  // ——— boilerplate line removal ———

  private def corpus = Seq(
    (1L, "prose one\nCOOKIE BANNER\n\nunique line A"),
    (2L, "prose two\nCOOKIE BANNER\nsometimes footer"),
    (3L, "COOKIE BANNER\nprose three\nsometimes footer"),
    (4L, "prose four\nno chrome here")).toDF("doc_id", "text")

  test("removeBoilerplateLines strips lines at df >= minDf, keeps the rest") {
    // COOKIE BANNER df=3 (removed at minDf=3); 'sometimes footer' df=2
    // (kept); empty lines and unique prose always survive
    val got = TextAnalysis.removeBoilerplateLines(corpus, "text", minDf = 3L)
      .orderBy("doc_id").select("clean").as[String].collect()
    assert(got.toSeq == Seq(
      "prose one\n\nunique line A",
      "prose two\nsometimes footer",
      "prose three\nsometimes footer",
      "prose four\nno chrome here"))
  }

  test("removeBoilerplateLines: within-doc repeats count once toward df") {
    // the repeated line sits in ONE doc twice: df=1, never removed even
    // at minDf=2; corpus-wide df counts documents, not occurrences
    val df = Seq(
      (1L, "dup line\ndup line\nbody"),
      (2L, "other body")).toDF("doc_id", "text")
    val got = TextAnalysis.removeBoilerplateLines(df, "text", minDf = 2L)
      .orderBy("doc_id").select("clean").as[String].collect()
    assert(got(0) == "dup line\ndup line\nbody")
  }

  test("removeBoilerplateLines: empty frequent set is the identity") {
    val got = TextAnalysis.removeBoilerplateLines(corpus, "text", minDf = 10L)
      .orderBy("doc_id")
    assert(got.select("clean").as[String].collect().toSeq ==
      corpus.orderBy("doc_id").select("text").as[String].collect().toSeq)
  }

  test("removeBoilerplateLines guards: outCol collision, minDf bound, " +
      "probe-table cap overflow") {
    intercept[IllegalArgumentException] {
      TextAnalysis.removeBoilerplateLines(
        corpus.withColumn("clean", lit("x")), "text", 3L)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.removeBoilerplateLines(corpus, "text", minDf = 1L)
    }
    // two lines reach df >= 2 but the cap admits only one -> loud failure
    val twoFrequent = Seq(
      (1L, "chrome A\nchrome B"), (2L, "chrome A\nchrome B"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.removeBoilerplateLines(
        twoFrequent, "text", minDf = 2L, maxFrequentLines = 1)
    }
    assert(e.getMessage.contains("minDf"))
  }

  test("boilerplate rewrite stage plans map-only over the corpus") {
    // the fit collects; the frame the caller gets back must be scan +
    // project only — no join, no exchange touches the text
    val plan = TextAnalysis.removeBoilerplateLines(corpus, "text", 3L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"rewrite shuffles:\n$plan")
    assert(!plan.contains("Join"), s"rewrite joins:\n$plan")
  }

  test("stripHtml: subtree removal wins over tag strip; entities; breaks") {
    val docs = Seq(
      // script body contains a bare '<' — subtree removal must eat it
      // whole, not leave 'b) {go()}' behind
      (1L, "<script>if (a<b) {go()}</script><p>keep me</p>"),
      (2L, "<style>p {c:red}</style>A<br/>B<!-- no -->C"),
      (3L, "x &amp; y &lt;t&gt; &quot;q&quot; &#39;s&#39; &nbsp;z"),
      (4L, "plain text, no markup"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "html")
    val got = docs
      .select(col("doc_id"),
        TextAnalysis.stripHtml(col("html")).as("clean"))
      .orderBy("doc_id")
      .as[(Long, Option[String])].collect().toSeq
    assert(got == Seq(
      (1L, Some("keep me")),
      (2L, Some("A\nB C")),
      (3L, Some("x & y <t> \"q\" 's' z")),
      (4L, Some("plain text, no markup")),
      (5L, None)))
  }

  test("fuzz: langSegments == driver-side heuristic model (50 cases)") {
    val markers = TextAnalysis.LangMarkers
    val langs = markers.keys.toSeq.sorted
    def predict(para: String): String = {
      val toks = para.split("\\s+")
      val scores = langs.map(l => l -> toks.count(markers(l).contains))
      // argmax, alphabetical tie-break (strictly-greater update order)
      scores.tail.foldLeft(scores.head) { case (best, cur) =>
        if (cur._2 > best._2) cur else best
      }._1
    }
    val vocab = markers.values.flatten.toSeq ++
      Seq("xyz", "qq", "data42", "", "zz")
    val rnd = new scala.util.Random(42L)
    val docs = (0L until 50L).map { i =>
      val nParas = rnd.nextInt(5)
      val paras = Seq.fill(nParas)(
        if (rnd.nextInt(6) == 0) "   " // whitespace-only paragraph
        else Seq.fill(1 + rnd.nextInt(8))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      (i, if (rnd.nextInt(10) == 0) null else paras.mkString("\n"))
    }
    val got = TextAnalysis.langSegments(docs.toDF("doc_id", "text"),
        "doc_id", "text", keepText = true)
      .select("doc_id", "para_idx", "predicted", "n_tok", "para")
      .as[(Long, Int, String, Long, String)].collect().toSeq.sorted
    val want = docs.flatMap { case (id, text) =>
      Option(text).getOrElse("").split("\n", -1).zipWithIndex.collect {
        case (p, idx) if p.trim.nonEmpty =>
          (id, idx, predict(p),
            "\\S+".r.findAllIn(p).size.toLong, p)
      }
    }.sorted
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("langSegments: per-paragraph LID, empties dropped, map-only plan") {
    val docs = Seq(
      (1L, "the data and of the\nder und die nicht der"),
      (2L, "le les des une\n\n   \nthe and data"), // blank + ws-only paras
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.langSegments(docs, "doc_id", "text")
      .orderBy("doc_id", "para_idx")
      .as[(Long, Int, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0, "en", 5L), (1L, 1, "de", 5L),
      (2L, 0, "fr", 4L), (2L, 3, "en", 3L)))
    // map-only: no exchange, no join at any corpus size
    val plan = TextAnalysis.langSegments(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"langSegments shuffles:\n$plan")
    // reserved id-name guard
    intercept[IllegalArgumentException] {
      TextAnalysis.langSegments(
        docs.withColumnRenamed("doc_id", "predicted"), "predicted", "text")
    }
  }
}
