package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.examples.DataPipeline

/** End-to-end run of the composed curation pipeline on the sf0.001 tables —
  * asserts the stages actually interlock (every stage feeds the next) and
  * that each gate removes what it should. */
class ExamplesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("DataPipeline.curate runs end-to-end and every gate bites") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (curated, eval, tokens) = DataPipeline.curate(docs, emb)
    val nIn = docs.count()
    val nOut = curated.count()
    val nEval = eval.count()
    assert(nOut > 0 && nOut < nIn)         // dedup/quality gates removed docs
    assert(nEval > 0 && nEval < nOut)      // sample is a strict subset
    assert(nEval.toDouble / nOut > 0.03 && nEval.toDouble / nOut < 0.25) // ~10%
    // eval rows all come from the curated corpus
    assert(eval.join(curated, Seq("doc_id"), "left_anti").count() == 0)
    // token stats cover every surviving language, with positive counts
    val t = tokens.collect()
    assert(t.nonEmpty && t.forall(_.getLong(2) > 0))
    assert(t.map(_.getLong(1)).sum == nOut)
    // deterministic: a second run yields the identical corpus
    val (curated2, _, _) = DataPipeline.curate(docs, emb)
    assert(curated.select("doc_id").except(curated2.select("doc_id")).count() == 0)
    assert(curated2.select("doc_id").except(curated.select("doc_id")).count() == 0)
  }

  test("stage 1.25: a seed-trained classifier gate bites and only shrinks the corpus") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // seed labels: positives from the corpus's own style, negatives spam-like
    import spark.implicits._
    val seed = (0 until 120).map { i =>
      if (i % 2 == 0) (s"table join query scan data value row agg $i", 1.0)
      else (s"free casino winner click buy now bonus $i", 0.0)
    }.toDF("text", "label")
    val clf = graft.ext.QualityClassifier.train(
      seed, "text", "label", numFeatures = 1 << 12)
    val (base, _, _) = DataPipeline.curate(docs, emb)
    val (gatedOut, _, _) = DataPipeline.curate(
      docs, emb, qualityModel = Some(clf), minQualityProb = 0.2)
    val nBase = base.count(); val nGated = gatedOut.count()
    // corpus docs look like the positives, so most survive — but the
    // gate is real: it can only shrink, never grow
    assert(nGated > 0 && nGated <= nBase)
    // an obviously-spammy threshold removes everything
    val (strict, _, _) = DataPipeline.curate(
      docs, emb, qualityModel = Some(clf), minQualityProb = 1.0)
    assert(strict.count() == 0)
  }

  test("stage 4 semantic blocking: the pipeline runs label-free end-to-end") {
    // the real-corpus path: no ground-truth label column needed for the
    // embedding sweep — Lloyd cells block the pair join instead
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .drop("label") // prove the label is genuinely unused
    val (curated, _, _) = DataPipeline.curate(docs, emb, semanticCells = 8)
    val n = curated.count()
    assert(n > 0 && n < docs.count())
    // deterministic: Lloyd seeds hash-derived, same corpus -> same result
    val (again, _, _) = DataPipeline.curate(docs, emb, semanticCells = 8)
    assert(curated.select("doc_id").except(again.select("doc_id")).count() == 0)
    assert(again.select("doc_id").except(curated.select("doc_id")).count() == 0)
  }

  test("prepareTraining: LM prune, mixture, and shards interlock") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (curated, _, _) = DataPipeline.curate(docs, emb)
    val training = DataPipeline.prepareTraining(curated)
    val nCur = curated.count(); val nTrain = training.count()
    // LM decile prune + 80% token budget both bite, but most docs survive
    assert(nTrain > 0 && nTrain < nCur)
    assert(nTrain.toDouble / nCur > 0.4)
    // training rows are curated rows, with shard/pos attached
    assert(training.join(curated, Seq("doc_id"), "left_anti").count() == 0)
    assert(training.columns.contains("shard") && training.columns.contains("pos"))
    // every shard is used; positions are dense 1..n per shard
    val shards = training.groupBy("shard").agg(
        count(lit(1)).as("n"), max(col("pos")).as("mx"))
      .as[(Int, Long, Long)].collect()
    assert(shards.length == 8)
    shards.foreach { case (_, n, mx) => assert(n == mx) }
    // (per-group budget safety itself is proven exhaustively in
    // MixtureSpec — here we only assert the stage is wired in)
    // deterministic end-to-end
    val training2 = DataPipeline.prepareTraining(curated)
    assert(training.select("doc_id", "shard", "pos")
      .except(training2.select("doc_id", "shard", "pos")).count() == 0)
    // ...and through to real files: the terminal write round-trips
    val dir = java.nio.file.Files.createTempDirectory("graft-train").toFile
    dir.deleteOnExit()
    val written = DataPipeline.prepareTrainingToFiles(curated, dir.getAbsolutePath)
    val back = spark.read.parquet(dir.getAbsolutePath)
    assert(back.count() == written.count())
    assert(back.select("doc_id").except(training.select("doc_id")).count() == 0)
  }

  test("stage 0: boilerplate chrome stripped and NFC canonicalized " +
      "before any hashing stage; chunk-grain training when chunkSize set") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs0 = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // seed template chrome into every doc, plus a DECOMPOSED e-acute
    // (e + U+0301) on a line made unique per doc — a frequent line would
    // be stripped as chrome before NFC could be observed
    val docs = docs0.withColumn("text",
      concat(col("text"), lit("\nAll rights reserved\ncafe\u0301 no "),
        col("doc_id").cast("string")))
    val (curated, _, _) = DataPipeline.curate(docs, emb, boilerplateMinDf = 10L)
    val texts = curated.select("text").as[String].collect()
    // the chrome line (df = corpus size) is gone from every survivor
    assert(texts.forall(!_.contains("All rights reserved")))
    // the decomposed combining sequence arrives COMPOSED (NFC), not lost
    assert(texts.forall(t => !t.contains("e\u0301") && t.contains("caf\u00e9")))
    // chunk-grain training: every row is a window of <= 32 tokens and
    // sharding keys on the (doc, chunk) pair — one doc spans shards
    val training = DataPipeline.prepareTraining(
      curated, chunkSize = 32, chunkStride = 24, nShards = 4)
    assert(training.columns.contains("chunk_id"))
    val bad = training.filter(col("n_tok") > 32 || col("n_tok") < 1).count()
    assert(bad == 0)
    assert(training.count() >
      training.select("doc_id").distinct().count()) // docs split into windows
    assert(training.select("shard").distinct().count() == 4)
    // the terminal writer accepts the same chunk grain (params thread
    // through to prepareTraining, not silently ignored)
    val dir = java.nio.file.Files.createTempDirectory("graft-chunks").toFile
    dir.deleteOnExit()
    val written = DataPipeline.prepareTrainingToFiles(
      curated, dir.getAbsolutePath, nShards = 4, chunkSize = 32, chunkStride = 24)
    val back = spark.read.parquet(dir.getAbsolutePath)
    assert(back.columns.contains("chunk_id"))
    assert(back.count() == written.count() && written.count() == training.count())
  }

  test("URL stage: blocklist and host cap bite between quality gate and dedup") {
    import org.apache.spark.sql.functions._
    val raw = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // seed the url column the way a web corpus carries one: a handful of
    // domains, one of them boilerplate-heavy
    val docs = raw.withColumn("url", concat(
      lit("https://"),
      when(col("doc_id") % 3 === 0, lit("spam.example.com"))
        .otherwise(concat(lit("h"), (col("doc_id") % 11).cast("string"),
          lit(".example.org"))),
      lit("/d/"), col("doc_id").cast("string")))
    val (base, _, _) = DataPipeline.curate(docs, emb)
    val (blocked, _, _) = DataPipeline.curate(docs, emb,
      blockedDomains = Seq("example.com"))
    // every spam.example.com doc is gone, and nothing else was touched
    assert(blocked.filter(col("url").contains("spam.example.com")).count() == 0)
    assert(base.filter(col("url").contains("spam.example.com")).count() > 0)
    assert(blocked.count() < base.count())
    // (no subset assertion: dropping a duplicate-group's keeper correctly
    // promotes a different representative in the dedup stages downstream)
    // the host cap bounds every host's surviving share
    val (capped, _, _) = DataPipeline.curate(docs, emb, maxDocsPerHost = 3)
    val worst = capped
      .groupBy(graft.ext.UrlOps.host(col("url"))).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(worst <= 3L)
    assert(capped.columns.sorted.sameElements(base.columns.sorted),
      "the cap stage must not leak host/rank columns downstream")
  }

  test("decontamination quarantines benchmark members; redaction scrubs PII") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val raw = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // seed a per-doc email into every text so the redaction stage has
    // real work on this corpus
    val docs = raw.withColumn("text",
      concat(col("text"), lit(" reach user"), col("doc_id"), lit("@example.com")))
    val bench = docs.filter(col("doc_id") % 41 === 0)
    val (curated, _, _) = DataPipeline.curate(docs, emb, Some(bench))
    // every exact benchmark member leaked 100% of its grams -> quarantined
    assert(curated.filter(col("doc_id") % 41 === 0).count() == 0)
    // no raw PII survives in the corpus text; placeholders do
    assert(curated.filter(col("text").contains("@example.com")).count() == 0)
    assert(curated.filter(col("text").contains("<EMAIL>")).count() > 0)
    // the gates still left a usable corpus behind
    assert(curated.count() > 0)
  }

  test("stage 2.5: span dedup strips a shared boilerplate run from later docs") {
    import org.apache.spark.sql.functions._
    val raw = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // plant the same 8-token footer on every 5th doc — classic template
    // chrome below the boilerplate-LINE radar (same line never repeats
    // within a doc) but exactly what span dedup removes
    val footer = "shared footer tokens alpha beta gamma delta epsilon"
    val docs = raw.withColumn("text",
      when(col("doc_id") % 5 === 0, concat(col("text"), lit(" " + footer)))
        .otherwise(col("text")))
    val (plain, _, _) = DataPipeline.curate(docs, emb)
    val (spanned, _, _) = DataPipeline.curate(docs, emb, spanDedupWindow = 8)
    // span dedup can only shrink surviving texts, never grow them
    val planted = plain.filter(col("text").contains(footer))
    val survivors = spanned.filter(col("text").contains(footer))
    assert(planted.count() > 1, "fixture should plant multiple footers")
    assert(survivors.count() <= 1,
      "all but the first footer occurrence must be stripped")
    assert(spanned.count() > 0)
  }

  test("stage 5.5: fuzzy decontamination drops near-copies the exact gate keeps") {
    import org.apache.spark.sql.functions._
    val raw = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val bench = raw.filter(col("doc_id") % 41 === 0)
    // a paraphrased benchmark copy: append one sentence to a benchmark
    // doc — most shingles shift but the MinHash signature stays close, so
    // the exact gram gate scores it low while the fuzzy gate catches it
    val paraphrase = bench.limit(1)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"),
        concat(col("text"), lit(" and that concludes the passage today"))
          .as("text"),
        col("lang"))
    val docs = raw.unionByName(paraphrase, allowMissingColumns = true)
    val (exactOnly, _, _) = DataPipeline.curate(docs, emb, Some(bench))
    val (withFuzzy, _, _) = DataPipeline.curate(docs, emb, Some(bench),
      fuzzyDecontaminationThreshold = Some(0.5))
    val fuzzyKept = withFuzzy.select("doc_id").distinct()
    // the fuzzy stage only shrinks the survivor set
    assert(fuzzyKept.join(exactOnly.select("doc_id").distinct(),
      Seq("doc_id"), "left_anti").count() == 0)
    // the planted paraphrase survives the exact gate but dies fuzzily
    // (guard: only meaningful if the paraphrase cleared the earlier gates)
    if (exactOnly.filter(col("doc_id") >= 1000000L).count() > 0)
      assert(withFuzzy.filter(col("doc_id") >= 1000000L).count() == 0)
    assert(withFuzzy.count() > 0)
  }
}
