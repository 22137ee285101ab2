package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10x scale smoke: replicate sf0.1 inputs in-plan (shifted keys) and run
  * the heaviest operators, timing each — an empirical check that the
  * partition strategies hold under a scale-up, not just at test size.
  * Run: `runMain graft.ScaleSmoke`
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "events")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // 10x replication with shifted entity/doc ids (1M events, 50k docs)
    val bigEvents = (0 until 10).map(k =>
      events.withColumn("user_id", col("user_id") + lit(k * 10000L))
        .withColumn("event_id", col("event_id") + lit(k * 1000000L)))
      .reduce(_ unionByName _)
    val bigDocs = (0 until 10).map(k =>
      docs.withColumn("doc_id", col("doc_id") + lit(k * 100000L)))
      .reduce(_ unionByName _)

    // SPARK_GRAFT_SMOKE_ONLY=substr[,substr...] runs matching blocks only
    // carried between the signature-index blocks; rebuilt on demand when
    // SPARK_GRAFT_SMOKE_ONLY skips the write block
    var smokeSigDir: String = null
    var smokeSpanDir: String = null
    val only = sys.env.get("SPARK_GRAFT_SMOKE_ONLY")
      .map(_.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty) // empty/blank filter would match every block
    def timed(name: String)(f: => Long): Unit =
      if (only.forall(_.exists(name.toLowerCase.contains))) {
        // scoped cleanup (Bench's trackingRdds pattern): release only the
        // RDD blocks THIS block creates (checkpoint frames pass block
        // ownership to the caller — that's us), so a future shared
        // bigDocs.cache() would survive; then force a GC so the
        // ContextCleaner reclaims dead shuffle state NOW — on a 48g
        // driver heap GC almost never fires on its own, shuffle metadata
        // piles up, and the iterative late blocks measured 4-10x slow
        // (spark.cleaner.periodicGC defaults to 30 min for exactly this;
        // between-block GC is its smoke analog)
        val before = spark.sparkContext.getPersistentRDDs.keySet
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($n rows)")
        spark.sparkContext.getPersistentRDDs
          .foreach { case (id, rdd) =>
            if (!before.contains(id)) rdd.unpersist(blocking = false) }
        System.gc()
      }
    timed("w1 windows 1M rows") {
      graft.ops.TimeSeriesOps.slidingWindows(
        bigEvents, "user_id", "event_id", Seq("value"), 8).count()
    }
    timed("w1 explode variant 1M") {
      graft.ops.TimeSeriesOps.slidingWindowsExplode(
        bigEvents, "user_id", "event_id", Seq("value"), 8).count()
    }
    timed("asof join 1M views/purch") {
      val v = bigEvents.filter(col("event_type") === "view")
      val p = bigEvents.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      graft.ops.AsOfJoin.asOf(v, p, Seq("user_id"), "ts", "ts", Seq("value")).count()
    }
    timed("minhash LSH 50k docs") {
      graft.ext.Dedup.minHashNearDuplicates(
        bigDocs, "doc_id", "text", threshold = 0.5).count()
    }
    timed("keep-best dedup 50k docs") {
      // the quality-aware representative policy end-to-end at x10:
      // pairs -> clusters -> argmax(token count) per cluster
      val pairs = graft.ext.Dedup.minHashNearDuplicates(
        bigDocs, "doc_id", "text", threshold = 0.5)
      val clusters = graft.ext.Dedup.duplicateClusters(pairs)
      graft.ext.Dedup.keepBestPerCluster(
        bigDocs.select(col("doc_id"),
          graft.ext.TextAnalysis.tokenCount(col("text")).cast("long")
            .as("n_tokens")),
        "doc_id", "n_tokens", clusters).count()
    }
    timed("resample+calendar 1M") {
      val daily = graft.ops.TimeSeriesOps.resampleSum(
        bigEvents, "user_id", "ts", Seq("value"), "day")
      graft.ops.TimeSeriesOps.calendarFill(
        daily, "user_id", "bucket", Seq("value")).count()
    }
    timed("simhash pairs 50k docs") {
      graft.ext.Dedup.simHashNearDuplicates(bigDocs, "doc_id", "text", 3).count()
    }
    // fuzzy decontamination: 50k-doc corpus against a 500-doc benchmark
    // (a real eval-suite scale ratio); broadcast benchmark, corpus map-only
    timed("fuzzy decontam 50k vs 500") {
      graft.ext.Dedup.fuzzyDecontaminate(
        bigDocs, docs.filter(col("doc_id") % 10 === 1),
        "doc_id", "doc_id", "text", "text", threshold = 0.5).count()
    }
    // ExactSubstr span dedup at the paper's n=50: rolling-hash windows,
    // exchanges carry (hash, id, pos) only, text rides 2 stages
    timed("span dedup 50k docs n=50") {
      graft.ext.Dedup.dropRepeatedSpans(bigDocs, "doc_id", "text", 50)
        .agg(sum(length(col("text")))).count()
    }
    // Misra-Gries vocab: one capacity-entry summary per partition vs the
    // exact form's row-per-distinct-token shuffle. On THIS corpus (31
    // distinct tokens) the exact groupBy wins locally — the sketch's
    // value is cardinality: its exchange stays `capacity` rows per
    // partition when the vocabulary has billions of distinct tokens
    timed("MG approx vocab 50k docs") {
      graft.ext.TextAnalysis.approxTopTokens(bigDocs, "text", 50,
        capacity = 4096).count()
    }
    timed("compression ratio 50k docs") {
      graft.ext.TextAnalysis.compressionStats(bigDocs, "doc_id", "text")
        .agg(sum(col("deflate_bytes")), avg(col("deflate_ratio"))).count()
    }
    timed("sessionize 1M events") {
      graft.ops.TimeSeriesOps.sessionize(
          bigEvents, Seq("user_id"), "ts", 43200L, Seq("event_id"))
        .groupBy(col("user_id"), col("session_id")).count().count()
    }
    timed("hash sample 1M events") {
      graft.ops.Sampling.hashSample(bigEvents, col("event_id"), 5)
        .groupBy(col("event_type")).count().count()
    }
    timed("heap top-5/group 1M events") {
      graft.ops.TopK.perGroup(bigEvents, Seq("event_type"),
        Seq(col("value").desc, col("event_id")), 5).count()
    }
    timed("window top-5/group 1M (ref)") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id"))
      bigEvents.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5).count()
    }
    timed("repetition stats 50k docs") {
      graft.ext.TextAnalysis.repetitionStats(bigDocs, "doc_id", "text", 2).count()
    }
    timed("vocab top-50 50k docs") {
      graft.ext.TextAnalysis.topTokens(bigDocs, "text", 50).count()
    }
    timed("ngram jaccard 50k docs") {
      // replicas are true near-dups: pair volume grows quadratically
      // within duplicate clusters (~251k pairs), which is the honest
      // worst-ish case for the posting-list pair enumeration
      graft.ext.Dedup.ngramJaccardPairs(bigDocs, "doc_id", "text", 3, 0.1).count()
    }
    timed("paragraph dedup 50k docs") {
      graft.ext.Dedup.dropRepeatedParagraphs(bigDocs, "doc_id", "text").count()
    }
    timed("quality prune 50k docs") {
      // one-pass shape: score once into the checkpointed narrow frame,
      // threshold subquery, filter — the count forces the whole chain
      graft.ext.TextAnalysis.pruneBottomQuantile(
        bigDocs, "text", 0.25, Seq("doc_id", "lang")).count()
    }
    timed("PII redaction 50k docs") {
      // aggregate OVER the redacted text: a bare count would let column
      // pruning drop the regex work entirely
      graft.ext.Redaction.redact(bigDocs, "text")
        .agg(sum(length(col("redacted"))).cast("long").as("c"))
        .head().getLong(0)
    }
    timed("contamination gate 50k docs") {
      // ~500-doc stand-in benchmark; sum over the kernel column so the
      // membership probe is not pruned away
      graft.streaming.ContaminationGate(
          bigDocs, bigDocs.filter(col("doc_id") % 97 === 0), "doc_id", "text")
        .agg(coalesce(sum(col("n_contaminated")), lit(0L)).as("c"))
        .head().getLong(0)
    }
    timed("mixture sample 50k docs") {
      // 4096 buckets over 50k docs: most buckets hold ≤ a few docs, so
      // the straddling-bucket window is near-degenerate — the shape the
      // operator has at real corpus sizes
      graft.ext.TextAnalysis.mixtureByTokenBudget(
        bigDocs, "doc_id", "lang", "text", 0.5).count()
    }
    timed("shard assign 50k docs") {
      // agg over pos so the per-shard sort is not pruned away
      graft.ops.Sampling.shardByHash(bigDocs, "doc_id", 64)
        .agg(sum(col("pos")).cast("long").as("c")).head().getLong(0)
    }
    timed("html strip + langseg 50k") {
      // crawl-ingest shape: wrap in markup, extract, per-paragraph LID —
      // all map-only, one pass
      val html = bigDocs.select(col("doc_id"),
        concat(lit("<html><body><h1>t</h1><p>"), col("text"),
          lit("</p><script>a<b</script></body></html>")).as("h"))
      graft.ext.TextAnalysis.langSegments(
        html.select(col("doc_id"),
          graft.ext.TextAnalysis.stripHtml(col("h")).as("text")),
        "doc_id", "text").count()
    }
    timed("epoch expand 50k docs") {
      // recipe weights over the x10 corpus: map-only CASE chain +
      // sequence explode, no exchange — the count forces the full
      // expansion (~1.9x rows with these weights)
      graft.ops.Sampling.epochExpand(
        bigDocs.select(col("doc_id"), col("source")), "doc_id", "source",
        Seq("src0" -> 0.0, "src1" -> 0.5, "src2" -> 2.5, "src3" -> 3.0))
        .count()
    }
    timed("pack sequences 50k docs") {
      // 2048-token windows over 64 shards: one prefix-sum window per
      // shard, one straddle explode, one bounded reassembly aggregate —
      // the production id stream (xxhash64 ids; the portable md5 twin is
      // the oracle query's job)
      val ids = bigDocs.select(col("doc_id"),
        transform(filter(split(col("text"), "\\s+"), t => length(t) > 0),
          t => pmod(xxhash64(t), lit(32768L))).as("tok_ids"))
      graft.ext.Packing.packSequences(ids, "tok_ids",
        pmod(col("doc_id"), lit(64L)), "doc_id", 2048, 32768L).count()
    }
    timed("unigram LM fit+score 50k") {
      // fit (two bounded passes) + kernel scoring pass; sum over the
      // score column so the kernel work is not pruned away
      val m = graft.ext.TextAnalysis.fitUnigramModel(
        bigDocs, "text", vocabSize = 64)
      graft.ext.TextAnalysis.scoreUnigram(bigDocs, "text", m)
        .agg(sum(col("sum_lp")).cast("long").as("c")).head().getLong(0)
    }
    // 50k docs with derived URLs: ~1k registered domains x cdn/www/bare
    // host variants — the cardinality shape of a crawl slice
    val bigUrls = bigDocs.withColumn("url", concat(
      lit("https://"),
      when(col("doc_id") % 4 === 0, lit("cdn."))
        .when(col("doc_id") % 4 === 1, lit("www."))
        .otherwise(lit("")),
      lit("site"), pmod(col("doc_id"), lit(997)).cast("string"),
      when(col("doc_id") % 5 === 0, lit(".co.uk")).otherwise(lit(".com")),
      lit("/p/"), col("doc_id").cast("string")))
    timed("url domain stats 50k") {
      // agg over n_tokens so the map-side token counting is not pruned
      graft.ext.UrlOps.domainStats(bigUrls, "url", "text")
        .agg(sum(col("n_tokens")).cast("long").as("c")).head().getLong(0)
    }
    timed("url host cap 50k") {
      graft.ext.UrlOps.capPerHost(
        bigUrls.select(col("doc_id"), col("url")), "url", "doc_id", 5).count()
    }
    timed("normalize+chunk 50k docs") {
      // NFC kernel + 64/48 overlapping windows; agg over chunk text so
      // neither the kernel nor the slice is pruned away
      graft.ext.TextAnalysis.chunkByTokens(
          bigDocs.select(col("doc_id"),
            graft.ext.TextAnalysis.normalizeText(col("text")).as("text")),
          "text", chunkSize = 64, stride = 48)
        .agg(sum(length(col("chunk_text"))).cast("long").as("c"))
        .head().getLong(0)
    }
    timed("boilerplate strip 50k docs") {
      // seeded chrome (df >> minDf) + per-doc unique line (df=1): the fit
      // exchange carries line-hash counts only; rewrite is one kernel eval
      val seeded = bigDocs.select(col("doc_id"),
        concat(col("text"),
          lit("\nShare this article\nCookie notice: we use cookies\nref "),
          col("doc_id").cast("string")).as("text"))
      graft.ext.TextAnalysis.removeBoilerplateLines(seeded, "text", 20L)
        .agg(sum(length(col("clean"))).cast("long").as("c")).head().getLong(0)
    }
    timed("bm25 retrieval 50k docs") {
      // 100 queries over the x10 corpus: the posting aggregation and the
      // candidate scoring are the corpus-sized stages; the query arm
      // stays broadcast at any corpus size (queries x terms = KBs)
      val queries = spark.range(100L).select(
        col("id").cast("int").as("qid"),
        concat_ws(" ",
          element_at(split(lit("spark window agg join merge batch"), " "),
            (col("id") % 6 + 1).cast("int")),
          element_at(split(lit("customer query vector stream hash data"), " "),
            (col("id") % 6 + 1).cast("int"))).as("qtext"))
      graft.ext.Retrieval.bm25TopK(
        bigDocs, "doc_id", "text", queries, "qid", "qtext", k = 20).count()
    }
    // the amortization claim with numbers: the one-time index build vs
    // the same 100 queries served from the persisted postings — no
    // re-tokenization, no posting aggregation at query time
    val bm25IdxDir = "/tmp/graft_smoke_bm25_idx"
    timed("bm25 index build+write 50k") {
      graft.ext.Retrieval.writeIndex(bigDocs, "doc_id", "text", bm25IdxDir)
      spark.read.parquet(bm25IdxDir).count()
    }
    timed("bm25 query via index") {
      val queries = spark.range(100L).select(
        col("id").cast("int").as("qid"),
        concat_ws(" ",
          element_at(split(lit("spark window agg join merge batch"), " "),
            (col("id") % 6 + 1).cast("int")),
          element_at(split(lit("customer query vector stream hash data"), " "),
            (col("id") % 6 + 1).cast("int"))).as("qtext"))
      graft.ext.Retrieval.bm25TopKFromIndex(
        spark.read.parquet(bm25IdxDir), "doc_id",
        queries, "qid", "qtext", k = 20).count()
    }
    // the full serving bundle (term dictionary + collection-stat
    // sidecars): query time never aggregates the postings at all — the
    // delta vs "query via index" is the sidecar payoff
    val bm25BundleDir = "/tmp/graft_smoke_bm25_bundle"
    timed("bm25 bundle build+write 50k") {
      graft.ext.Retrieval.writeIndexBundle(bigDocs, "doc_id", "text",
        bm25BundleDir)
      spark.read.parquet(s"$bm25BundleDir/postings").count()
    }
    timed("bm25 bundle serve 100q") {
      val queries = spark.range(100L).select(
        col("id").cast("int").as("qid"),
        concat_ws(" ",
          element_at(split(lit("spark window agg join merge batch"), " "),
            (col("id") % 6 + 1).cast("int")),
          element_at(split(lit("customer query vector stream hash data"), " "),
            (col("id") % 6 + 1).cast("int"))).as("qtext"))
      graft.ext.Retrieval.bm25TopKFromBundle(bm25BundleDir, "doc_id",
        queries, "qid", "qtext", k = 20).count()
    }
    timed("tfidf bundle serve 6 terms") {
      graft.ext.Retrieval.tfidfFromBundle(spark, bm25BundleDir, "doc_id",
        Seq("spark", "window", "agg", "customer", "vector", "merge"))
        .count()
    }
    timed("clf marker logit 50k docs") {
      graft.ext.QualityClassifier.markerLogit(
          bigDocs, "text",
          Seq(("data", 0.75), ("slow", -1.25), ("spark", 0.5),
            ("the", -0.125)), bias = -0.25)
        .agg(sum(when(col("prob") >= 0.5, 1L).otherwise(0L))).head()
      bigDocs.count()
    }
    timed("semantic dedup 50k vectors") {
      // Lloyd-cell blocking on the x10 embedding frame: 128 cells bound
      // the within-cell pair joins; the cap skips degenerate cells whole
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val bigEmb = (0 until 10).map(k =>
        emb.withColumn("vec_id", col("vec_id") + lit(k * 100000L)))
        .reduce(_ unionByName _)
      graft.ext.Similarity.semanticDuplicates(
        bigEmb, "vec_id", "embedding", threshold = 0.4,
        numCells = 128, maxBlockSize = 2000).count()
    }
    timed("skewed domain stats 1M urls") {
      // 50% of a 1M-row corpus on one mega-domain: the crawl-corpus skew
      // shape. Auto guard samples, detects the hot key, runs the salted
      // (domain, host, salt) cascade — wall time must stay flat vs the
      // balanced case because no reducer ever sees the mega-domain's raw
      // rows in one task
      val urls = spark.range(1000000L).select(
        col("id").as("doc_id"),
        concat(lit("https://"),
          when(col("id") % 2 === 0, lit("www.mega-site.com"))
            .otherwise(concat(lit("site"), pmod(col("id"), lit(5000)),
              lit(".com"))),
          lit("/page/"), col("id")).as("url"),
        concat(lit("token "), col("id")).as("text"))
      graft.ext.UrlOps.domainStatsAuto(urls, "url", "text").count()
    }
    timed("skewed host cap 1M urls") {
      // same fixture through capPerHost: the bounded-heap TopK's PARTIAL
      // phase reduces the mega-host to k rows per map partition before
      // the exchange — the skew never reaches a reducer
      val urls = spark.range(1000000L).select(
        col("id").as("doc_id"),
        concat(lit("https://"),
          when(col("id") % 2 === 0, lit("www.mega-site.com"))
            .otherwise(concat(lit("site"), pmod(col("id"), lit(5000)),
              lit(".com"))),
          lit("/page/"), col("id")).as("url"))
      graft.ext.UrlOps.capPerHost(urls, "url", "doc_id", 100).count()
    }
    timed("ivf retrain x3 batches") {
      // three query batches, Lloyd retrained per call — the cost
      // writeCentroids amortizes away
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      (0 until 3).map { b =>
        graft.ext.Similarity.ivfTopK(
          emb.filter(col("vec_id") % 50 === b), emb, "vec_id", "embedding",
          k = 5, numCells = 64, numProbes = 4).count()
      }.sum
    }
    timed("ivf prebuilt x3 batches") {
      // same three batches over one persisted centroid build: build cost
      // paid once, serving is assignment+probe only
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val dir = java.nio.file.Files.createTempDirectory("smoke_centroids").toString
      graft.ext.Similarity.writeCentroids(
        emb, "vec_id", "embedding", dir, numCells = 64)
      (0 until 3).map { b =>
        graft.ext.Similarity.ivfTopKFromCentroids(
          emb.filter(col("vec_id") % 50 === b), emb, "vec_id", "embedding",
          k = 5, dir, numProbes = 4).count()
      }.sum
    }
    // incremental-ingest dedup: a ~500-doc increment against a ~45k-doc
    // disjoint history (a real daily-crawl ratio) — via the history's
    // persisted signature frame vs re-shingling it per increment.
    // HONEST local read: the two run ~even HERE because the synthetic
    // docs are short (re-shingling 45k tiny texts ≈ decoding 45k sig
    // arrays from parquet). The index's real wins are proportional to
    // text size (web docs: KBs-100KBs text vs 256 B sig = 10-400x less
    // IO per increment) and structural: the history TEXT need not be
    // retained or readable at dedup time at all
    val smokeHistory = bigDocs.filter(col("doc_id") % 10 =!= 7)
    val smokeShard = docs.filter(col("doc_id") % 10 === 7)
    timed("sig index write 45k history") {
      val dir = java.nio.file.Files.createTempDirectory("smoke_sigs").toString
      graft.ext.Dedup.writeSignatures(smokeHistory, "doc_id", "text", dir)
      smokeSigDir = dir
      spark.read.parquet(dir).count()
    }
    timed("increment dedup vs index") {
      if (smokeSigDir == null) { // write block skipped via SMOKE_ONLY
        smokeSigDir = java.nio.file.Files.createTempDirectory("smoke_sigs").toString
        graft.ext.Dedup.writeSignatures(smokeHistory, "doc_id", "text", smokeSigDir)
      }
      graft.ext.Dedup.dedupIncrement(smokeShard,
        spark.read.parquet(smokeSigDir), "doc_id", "doc_id", "text",
        threshold = 0.5).count()
    }
    timed("increment dedup recompute") {
      // the same history comparison WITHOUT the index: re-shingle +
      // re-hash the full history per increment
      val vsHistory = graft.ext.Dedup.minHashCrossPairs(smokeShard,
          smokeHistory, "doc_id", "doc_id", "text", "text", threshold = 0.5,
          broadcastBenchmark = false)
        .select(col("id_a").as("doc_id"))
      val within = graft.ext.Dedup.minHashNearDuplicates(smokeShard,
          "doc_id", "text", threshold = 0.5)
        .select(greatest(col("id_a"), col("id_b")).as("doc_id"))
      smokeShard.join(vsHistory.unionByName(within).distinct(),
        Seq("doc_id"), "left_anti").count()
    }
    // skewed-benchmark contamination: ONE boilerplate benchmark doc whose
    // grams sit in 50% of a 500k-doc corpus — the worst case for the
    // (cid, bench_id) shuffle (the hot gram's join output is 250k rows for
    // that one bench doc) and for the fuzzy gate's banded verify. Partial
    // aggregation must bound it: map-side (cid, bench_id) combining means
    // no reducer ever sees the hot benchmark doc's raw gram hits in one
    // task. Wall time must stay in line with the balanced gate blocks.
    val boiler = "subscribe to our newsletter for updates and offers today"
    val skewDocs = spark.range(500000L).select(
      col("id").as("doc_id"),
      concat(
        when(col("id") % 2 === 0, lit(boiler + " ")).otherwise(lit("")),
        lit("doc body token "), col("id").cast("string"),
        lit(" filler "), pmod(col("id"), lit(1000)).cast("string")).as("text"))
    val skewBench = spark.range(3L).select(
      (col("id") + 1000000L).as("doc_id"),
      when(col("id") === 0, lit(boiler))
        .otherwise(concat(lit("benign eval question "),
          col("id").cast("string"), lit(" unique phrasing nothing shared")))
        .as("text"))
    timed("skewed-bench contam score") {
      graft.ext.Dedup.contaminationScore(
          skewDocs, skewBench, "doc_id", "text")
        .agg(sum(col("n_contaminated")).cast("long").as("c")).head().getLong(0)
    }
    timed("skewed-bench attribution") {
      graft.ext.Dedup.contaminationAttribution(
        skewDocs, skewBench, "doc_id", "doc_id", "text", "text").count()
    }
    timed("skewed-bench fuzzy gate") {
      // the hot bench doc's band buckets hold 250k corpus candidates; the
      // gate's per-row kernel verify must stay map-only (no pair exchange)
      graft.streaming.FuzzyContaminationGate.withMaxSimilarity(
          skewDocs, skewBench, "text", "text")
        .agg(sum(when(col("max_benchmark_similarity") >= 0.7, 1L)
          .otherwise(0L)).as("c")).head().getLong(0)
    }
    // incremental span-dedup: the ExactSubstr analogue of the signature
    // index — mask an increment's history-repeated spans from the
    // PERSISTED (h1, h2, id, pos) frame vs re-window-hashing the full
    // history per increment. Same honest-IO caveat as the sig index:
    // these synthetic texts are tiny, so local times run close; the win
    // scales with text size (the history text is never read — or kept)
    timed("span index write 45k history") {
      val dir = java.nio.file.Files.createTempDirectory("smoke_spanidx").toString
      graft.ext.Dedup.writeSpanIndex(smokeHistory, "doc_id", "text",
        dir, n = 20)
      smokeSpanDir = dir
      spark.read.parquet(dir).count()
    }
    timed("span increment vs index") {
      if (smokeSpanDir == null) { // write block skipped via SMOKE_ONLY
        smokeSpanDir = java.nio.file.Files.createTempDirectory("smoke_spanidx").toString
        graft.ext.Dedup.writeSpanIndex(smokeHistory, "doc_id", "text",
          smokeSpanDir, n = 20)
      }
      graft.ext.Dedup.dropRepeatedSpansIncrement(smokeShard,
          spark.read.parquet(smokeSpanDir), "doc_id", "text", n = 20)
        .agg(sum(length(col("text")))).count()
    }
    timed("span increment recompute") {
      // the same masking WITHOUT the index: window-hash history + shard
      graft.ext.Dedup.dropRepeatedSpans(
          smokeHistory.unionByName(smokeShard), "doc_id", "text", n = 20)
        .join(smokeShard.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .agg(sum(length(col("text")))).count()
    }
    // pipeline_curate at x100 (500k docs, 200k vectors): per-stage wall
    // times via eager cuts between stages (each number is ONE stage's
    // true cost), then the COMPOSED chain end-to-end with its scan count
    // — the super-linearity check for the checkpoint strategy and stage
    // ordering (a stage whose x100 time is >>10x its x10 share would
    // surface here)
    val big100 = docs
      .select(col("doc_id"), col("text"), col("lang"),
        explode(sequence(lit(0), lit(99))).as("__k"))
      .select((col("doc_id") + col("__k") * lit(100000L)).as("doc_id"),
        col("text"), col("lang"))
    val emb100 = {
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      emb.select(col("vec_id"), col("embedding"), col("label"),
          explode(sequence(lit(0), lit(99))).as("__k"))
        .select((col("vec_id") + col("__k") * lit(100000L)).as("vec_id"),
          col("embedding"), col("label"))
    }
    val bench100 = docs.filter(col("doc_id") % 97 === 3)
    // the staged x100 blocks share mutable state (each stage's eager cut
    // feeds the next), so the group runs when ANY of its block names
    // matches the SMOKE_ONLY filter; with a partial match the skipped
    // stages' work simply folds into the next selected stage's timing
    val x100StageNames = (1 to 6).map(i => s"x100 stage $i")
    // timedKeep: the stage chain's eager checkpoints must SURVIVE their
    // own timed block (the next stage reads those blocks) — cleanup runs
    // once for the whole group below
    def timedKeep(name: String)(f: => Long): Unit =
      if (only.forall(_.exists(name.toLowerCase.contains))) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($n rows)")
      }
    if (only.forall(fs => x100StageNames.exists(n => fs.exists(n.contains)))) {
      val groupBefore = spark.sparkContext.getPersistentRDDs.keySet
      var stage = graft.ext.TextAnalysis.qualityFeatures(
          graft.ext.TextAnalysis.langId(
            big100.withColumn("text",
              graft.ext.TextAnalysis.unicodeNormalize(col("text"))),
            "text", "predicted_lang"), "text")
        .filter(col("n_words") >= 5 && col("stop_ratio") <= 0.9 &&
          col("quality_score") > 0.2)
      timedKeep("x100 stage 1 gates 500k") {
        stage = stage.localCheckpoint(); stage.count()
      }
      timedKeep("x100 stage 2 exact dedup") {
        stage = graft.ext.Dedup.exact(stage, Seq("text"), "doc_id")
          .localCheckpoint()
        stage.count()
      }
      timedKeep("x100 stage 3 near-dup clusters") {
        val pairs = graft.ext.Dedup.minHashNearDuplicates(
          stage, "doc_id", "text", threshold = 0.7)
        val losers = graft.ext.Dedup.duplicateClusters(pairs)
          .filter(col("id") =!= col("cluster_id"))
          .select(col("id").as("doc_id"))
        stage = stage.join(losers, Seq("doc_id"), "left_anti").localCheckpoint()
        stage.count()
      }
      timedKeep("x100 stage 4 embedding sweep") {
        val vecs = emb100.join(
          stage.select(col("doc_id").as("vec_id")), "vec_id")
        val vecLosers = graft.ext.Similarity.embeddingNearDuplicates(
            vecs, "vec_id", "embedding", "label", 0.995)
          .select(col("id_b").as("doc_id")).distinct()
        stage = stage.join(vecLosers, Seq("doc_id"), "left_anti").localCheckpoint()
        stage.count()
      }
      timedKeep("x100 stage 5 decontam gate") {
        stage = graft.streaming.ContaminationGate.withScore(
            stage, bench100, "text")
          .filter(col("contamination") < 0.5)
          .drop("n_grams", "n_contaminated", "contamination")
          .localCheckpoint()
        stage.count()
      }
      timedKeep("x100 stage 6 redact+account") {
        val red = graft.ext.Redaction.redact(stage, "text", counts = false)
          .drop("text").withColumnRenamed("redacted", "text")
        red.select(col("predicted_lang"),
            graft.ext.TextAnalysis.tokenCount(col("text")).as("n"))
          .groupBy(col("predicted_lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("total_tokens"))
          .count()
      }
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) =>
          if (!groupBefore.contains(id)) rdd.unpersist(blocking = false) }
      System.gc()
    }
    timed("pipeline x100 composed 500k") {
      val (curated, _, _) = graft.examples.DataPipeline.curate(
        big100, emb100, benchmark = Some(bench100))
      val plan = curated.queryExecution.executedPlan.toString
      val scans = plan.linesIterator.count(_.contains("Scan parquet"))
      // 0 here is the POINT: every corpus read sits behind the two lazy
      // checkpoint cuts, so the serving segment re-reads materialized
      // blocks (Scan ExistingRDD), never the parquet
      println(s"  [pipeline x100] parquet scans in the final serving " +
        s"segment: $scans (corpus reads live behind the checkpoint cuts)")
      curated.count()
    }
    timed("ingest+pack x100 composed 500k") {
      // the OTHER composed chain at x100: markup wrap -> stripHtml ->
      // paragraph LID -> en-reassembly -> epoch upsampling -> xxhash ids
      // -> 1024-token windows. Everything before packSequences' two
      // terminal exchanges is one map stage over the scan.
      val html = big100.select(col("doc_id"),
        concat(lit("<html><body><div>nav | menu</div><p>"), col("text"),
          lit("</p><script>a<b</script></body></html>")).as("h"))
      val clean = html.select(col("doc_id"),
        graft.ext.TextAnalysis.stripHtml(col("h")).as("text"))
      val en = graft.ext.TextAnalysis.langSegments(
          clean, "doc_id", "text", keepText = true)
        .filter(col("predicted") === "en")
        .groupBy(col("doc_id"))
        .agg(concat_ws("\n", transform(
          array_sort(collect_list(struct(col("para_idx").as("i"),
            col("para").as("p")))),
          x => x.getField("p"))).as("text"))
        .join(big100.select(col("doc_id"), col("lang")), Seq("doc_id"))
      val expanded = graft.ops.Sampling.epochExpand(en, "doc_id",
        "lang", Seq("de" -> 0.5, "zh" -> 2.5))
      val ids = expanded.select(
        (col("doc_id") * 8L + col("epoch")).as("ord"),
        pmod(col("doc_id"), lit(64L)).as("shard_key"),
        transform(filter(split(col("text"), "\\s+"), t => length(t) > 0),
          t => pmod(xxhash64(t), lit(32768L))).as("tok_ids"))
      graft.ext.Packing.packSequences(ids, "tok_ids", col("shard_key"),
        "ord", 1024, 32768L).count()
    }
    timed("star clusters 100x100 chains") {
      // 100 disjoint 100-node paths: diameter 99 — the long-chain shape
      // the star contraction exists for (min-label would need 99 rounds)
      val chain = spark.range(10000L).filter(col("id") % 100 =!= 99)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      graft.ext.Dedup.duplicateClusters(chain, algorithm = "star").count()
    }
    timed("auto clusters 100x100 chains") {
      // same pathological graph with the driver finish DISABLED: min-label
      // stalls for AutoEscalateRounds, then star contraction finishes —
      // the bounded-prelude posture a 100 TB boilerplate mega-cluster hits
      // (its pair list exceeds any driver cap by construction)
      val chain = spark.range(10000L).filter(col("id") % 100 =!= 99)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      graft.ext.Dedup.duplicateClusters(chain, driverFinishMaxPairs = 0).count()
    }
    timed("auto clusters driver finish") {
      // the same 9.9k-pair graph through the DEFAULT path: the bounded
      // limit-probe collects it and union-find labels it driver-side —
      // the small-graph endgame (labels spec'd identical to distributed)
      val chain = spark.range(10000L).filter(col("id") % 100 =!= 99)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      graft.ext.Dedup.duplicateClusters(chain).count()
    }

    // ——— edit-distance pairs at 50k docs (+50k seeded twins) ———
    // the prefix posting is k·q+1 rows per doc whatever the corpus size;
    // rarity ordering keeps candidate volume tracking true near-dup
    // density. Twins guarantee 50k real pairs exist — the verify side is
    // exercised at volume, not just the pruning.
    timed("edit-distance pairs 100k docs") {
      val subset = bigDocs.select(col("doc_id"), col("text"))
      val twins = subset.select((col("doc_id") + lit(10000000L)).as("doc_id"),
        concat(col("text").substr(lit(1), length(col("text")) - 3),
          lit(" zq")).as("text"))
      graft.ext.Dedup.editDistancePairs(
        subset.unionByName(twins), "doc_id", "text", maxEdits = 6).count()
    }

    // ——— DSIR importance resampling at 50k docs ———
    // fit exchanges are bounded by `buckets` rows per task whatever the
    // corpus size; scoring is strictly map-only (plan pinned in DsirSpec);
    // the resample tail is the bounded-heap TopK. The 50k run times the
    // full fit→fit→score→select chain at production bucket count.
    timed("dsir fit+score+select 50k") {
      val target = bigDocs.filter(col("doc_id") % 17 === 0)
      val raw = bigDocs.filter(col("doc_id") % 17 =!= 0)
      val tm = graft.ext.Dsir.fitHashedModel(target, "text",
        buckets = 8192, maxN = 2)
      val rm = graft.ext.Dsir.fitHashedModel(raw, "text",
        buckets = 8192, maxN = 2)
      graft.ext.Dsir.resample(raw, "doc_id", "text", tm, rm, k = 1000)
        .count()
    }

    // ——— round-14 corpus-audit family ———
    timed("source overlap 50k docs") {
      // the scale posture: hashGrams thins the one corpus exchange to
      // 64-bit keys, the cap bounds per-gram pair fan-out; 20 sources
      // over 50k docs — output is the C(20,2) matrix
      graft.ext.Dedup.sourceOverlap(bigDocs, "text", "source",
        hashGrams = true, maxSourcesPerGram = 64).count()
    }
    timed("soft dedup weights 50k docs") {
      // portable-minhash pairs → cluster labels → cluster-partitioned
      // count window; the x10 replica clusters are exactly the
      // duplicate-mass case soft dedup downweights
      val subset = bigDocs.select(col("doc_id"), col("text"))
      val clusters = graft.ext.Dedup.duplicateClusters(
        graft.ext.Dedup.minHashNearDuplicates(
          subset, "doc_id", "text", threshold = 0.9)
          .select(col("id_a"), col("id_b")))
      graft.ext.Dedup.softDedupWeights(
        subset.select(col("doc_id")), "doc_id", clusters).count()
    }
    timed("centroid drift 5k vectors") {
      // one posexplode pass to (group, dim) sums; vectors never shuffle
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val bigEmb = (0 until 10).map(k =>
        emb.withColumn("vec_id", col("vec_id") + lit(k * 100000L)))
        .reduce(_ unionByName _)
      graft.ext.Similarity.centroidDrift(bigEmb, "embedding", "label")
        .count()
    }

    // ——— fused forecast evaluation at 1M rows ———
    // the one-exchange shape: split flag, train-mean and seasonal lag
    // are windows over the SAME entity partitioning, the aggregate
    // reuses it — per-entity state bounded by one series' length
    timed("forecast metrics 1M events") {
      graft.metrics.Metrics.meanBaselineAccuracyByEntity(
        bigEvents, "user_id", "event_id", "value", horizon = 3).count()
    }

    // ——— round-16 additions: KMV overlap, box stats, compact attribution ———
    timed("KMV corpus overlap 50k docs") {
      // production hash path (one xxhash64 per shingle); the exchange
      // carries (hash, flag, flag) rows only and the bottom-k is the
      // bounded heap (plan-contract-pinned: never a Window/sort of the
      // hash universe). Driver state = ONE row; k_used caps at k no
      // matter the corpus size.
      val r = graft.ext.Dedup.corpusOverlapEstimate(
          bigDocs.filter(col("doc_id") % 2 === 0),
          bigDocs.filter(col("doc_id") % 2 === 1),
          "text", "text", k = 256, portable = false)
        .head()
      assert(r.getLong(0) <= 256L,
        s"KMV sketch k_used ${r.getLong(0)} exceeds k — unbounded state")
      1L
    }
    timed("metric box stats 1M events") {
      // exact per-group quartiles: the percentile aggregate holds ONE
      // group's values, the output is ONE row per group (20 entities x
      // 10 replicas = bounded), and the whisker pass re-reads the data
      // against a BROADCAST quartile frame — no second wide exchange
      val box = graft.ops.DataPlots.metricsBoxFrame(
        bigEvents.select(pmod(col("user_id"), lit(200L)).as("grp"),
          col("value")), Seq("grp"), "value")
      val n = box.count()
      assert(n <= 200L, s"box frame emitted $n rows for <=200 groups")
      n
    }
    timed("compact attribution 50k docs") {
      // bounded-benchmark single-pass kernel at x10 corpus: the posting
      // collect sees only the 500-doc eval suite (guarded), the corpus
      // side is ONE kernel map pass — no gram join, no corpus x bench
      // pair exchange at any corpus size
      graft.ext.Dedup.contaminationAttributionCompact(
        bigDocs, docs.filter(col("doc_id") % 97 === 3).limit(500),
        "doc_id", "doc_id", "text", "text").count()
    }

    // ——— real codecs at x10: video decode fan-out, image dedup ———
    timed("AVI decode+sample 50k") {
      // encode→decode→frame-sample entirely inside each task: the only
      // job structure is scan → mapPartitions → count (no exchange —
      // frame fan-out multiplies rows WITHIN the task, so at 100 TB the
      // stage parallelism is the scan's)
      import spark.implicits._
      val media = bigDocs
        .select(col("doc_id"), coalesce(col("n_chars"), lit(0L)).as("nc"))
        .as[(Long, Long)].map { case (id, nc) =>
          graft.ext.Multimodal.MediaItem(
            id, graft.ext.Multimodal.synthAvi(id, nc), "", "smoke")
        }
      val frames = graft.ext.Multimodal.sampleVideoFrames(media, stride = 2)
      val n = frames.count()
      assert(n >= 50000L, s"frame sampling lost rows: $n")
      n
    }
    timed("MJPEG decode+sample 20k videos") {
      // compressed video at volume: encode→Huffman+IDCT decode→frame
      // sample entirely inside each task (scan → mapPartitions → count,
      // no exchange) — the MJPG branch pays a full baseline-JPEG decode
      // per frame, so throughput here is the codec's, not the container's
      import spark.implicits._
      val media = bigDocs.limit(20000)
        .select(col("doc_id"), coalesce(col("n_chars"), lit(0L)).as("nc"))
        .as[(Long, Long)].map { case (id, nc) =>
          graft.ext.Multimodal.MediaItem(
            id, graft.ext.Multimodal.synthAviMjpeg(id, nc), "", "smoke")
        }
      val frames = graft.ext.Multimodal.sampleVideoFrames(media, stride = 2)
      val n = frames.count()
      assert(n >= 20000L, s"MJPEG frame sampling lost rows: $n")
      n
    }
    timed("audio gates 50k clips") {
      // decode + all four gates inside the scan task, one thin row per
      // clip — same map-only contract as the AVI path
      import spark.implicits._
      val media = bigDocs
        .select(col("doc_id"), coalesce(col("n_chars"), lit(0L)).as("nc"))
        .as[(Long, Long)].map { case (id, nc) =>
          graft.ext.Multimodal.MediaItem(
            id, graft.ext.Multimodal.synthWav(id, nc), "", "smoke")
        }
      graft.ext.Multimodal.audioQuality(media).count()
    }
    timed("audio segmentation 50k clips") {
      // decode + linear scan per clip, per-utterance fan-out INSIDE the
      // task — scan-parallel at any corpus size, like the AVI path
      import spark.implicits._
      val media = bigDocs
        .select(col("doc_id"), coalesce(col("n_chars"), lit(0L)).as("nc"))
        .as[(Long, Long)].map { case (id, nc) =>
          val n = (nc % 80 + 30).toInt
          val g = (5 + id % 4).toInt
          val samples = Array.tabulate(n)(i =>
            if (i % 37 < g) 0.toShort
            else ((id * 31 + i * 7919L) % 65536 - 32768).toShort)
          graft.ext.Multimodal.MediaItem(
            id, graft.ext.Multimodal.buildWav(1, 8000, samples), "", "smoke")
        }
      val n = graft.ext.Multimodal.segmentBySilence(media).count()
      assert(n >= 50000L, s"segmentation lost clips: $n")
      n
    }
    timed("domain split 50k urls") {
      // one md5 per row, no shuffle: the split is a scan-stage column
      val urls = bigDocs.select(col("doc_id"),
        concat(lit("https://sub"), col("doc_id").cast("string"),
          lit(".site"), pmod(col("doc_id"), lit(997)).cast("string"),
          lit(".com/p/"), col("doc_id").cast("string")).as("url"))
      val split = graft.ext.UrlOps.domainSplit(urls, "url")
      val counts = split.groupBy("split").count().collect()
      assert(counts.map(_.getLong(1)).sum == 50000L)
      counts.length.toLong
    }
    timed("image dHash near-dup 50k") {
      // 50k images -> 8-byte signatures map-side; the ONLY exchanges are
      // the 4-chunk banding shuffle and the thin pair dedup — bucket
      // caps bound any degenerate chunk, pairs verified by bit_count.
      // This seeding deliberately produces same-hash CLIQUES (constant-
      // offset gradients collide), so the ~500k-pair output is the
      // correct quadratic-output-linear-work LSH contract under mass
      // duplication — the shape a crawl's identical-logo corpus takes
      // (clique consumers should cluster/keep-first, not enumerate)
      import spark.implicits._
      val media = bigDocs
        .select(col("doc_id")).as[Long].map { id =>
          val w = (9 + id % 16).toInt; val h = (8 + id % 8).toInt
          val px = Array.tabulate(w * h * 3)(j =>
            ((id * 7 + j * (13 + id % 11)) % 256).toByte)
          graft.ext.Multimodal.MediaItem(
            id, graft.ext.Multimodal.buildBmp(w, h, px), "", "smoke")
        }
      graft.ext.Multimodal.imageNearDuplicates(
        media, maxDistance = 3, maxBucketSize = 2000).count()
    }
    timed("image ingest increment 50k vs 50k index") {
      // the streaming perceptual-ingest kernel at x10: a 50k-image batch
      // against a 50k-hash persisted index — batch and index each band
      // map-side (4 chunks, capped), the cross equi-join exchanges
      // (16-bit key, id, 8-byte sig) rows only, and history x history
      // pairs never form (the self-join over batch∪index would re-pair
      // the whole archive every micro-batch). The index carries a
      // brightness-shifted variant of each EVEN batch image (dHash
      // gradient ≈ invariant → real cross-hit) and a structurally
      // different image for odd ids. The batch seeding itself is the
      // mass-duplication corpus (constant-offset gradients form
      // brightness cliques per (w, h, stride) class), so the gate's
      // within-batch arm collapses each clique to its min-id
      // representative and the cross arm then drops representatives the
      // index already covers — the banded survivor count proves both
      // arms discriminate at volume (neither 0 nor 50k).
      import spark.implicits._
      def gradPx(id: Long, shift: Long): (Int, Int, Array[Byte]) = {
        val w = (9 + id % 16).toInt; val h = (8 + id % 8).toInt
        (w, h, Array.tabulate(w * h * 3)(j =>
          ((id * 7 + shift + j * (13 + id % 11)) % 256).toByte))
      }
      val batch = bigDocs.select(col("doc_id")).as[Long].map { id =>
        val (w, h, p) = gradPx(id, 0)
        (id, graft.ext.Multimodal.dHash64(p, w, h))
      }.toDF("media_id", "dhash")
      val index = bigDocs.select(col("doc_id")).as[Long].map { id =>
        val (w, h, p) =
          if (id % 2 == 0) gradPx(id, 64) // brightness twin of batch id
          else {
            val w0 = (9 + id % 16).toInt; val h0 = (8 + id % 8).toInt
            (w0, h0, Array.tabulate(w0 * h0 * 3)(j =>
              ((id * 5 + j.toLong * j * 31 + 7) % 256).toByte)) // far
          }
        (id + 1000000L, graft.ext.Multimodal.dHash64(p, w, h))
      }.toDF("media_id", "dhash")
      val n = graft.ext.Multimodal.imageDedupIncrement(
        batch, index, "media_id", "dhash",
        maxDistance = 3, maxBucketSize = 2000).count()
      assert(n > 0 && n < 50000L,
        s"ingest gate must discriminate at volume, kept $n of 50000")
      n
    }
    timed("lossless codecs 50k (png+gif)") {
      // DEFLATE + LZW decode at x10, both map-only: encode -> inflate/
      // LZW-decode -> defilter/deinterlace -> features inside each task
      import spark.implicits._
      val media = bigDocs
        .select(col("doc_id"), coalesce(col("n_chars"), lit(0L)).as("nc"))
        .as[(Long, Long)].map { case (id, nc) =>
          val payload =
            if (id % 2 == 0) graft.ext.Multimodal.synthPng(id, nc)
            else graft.ext.Multimodal.synthGif(id, nc)
          graft.ext.Multimodal.MediaItem(id, payload, "", "smoke")
        }
      val n = graft.ext.Multimodal.decodeRealMedia(media)
        .filter(col("format").isin("image/png", "image/gif")).count()
      assert(n == 50000L, s"png/gif decode lost rows: $n")
      n
    }
    timed("warc parse 50k records") {
      // crawl-container ingest at x10: each task builds and re-parses a
      // 10-record archive (every other one in the per-record-gzip form
      // CommonCrawl uses), all inside the task — the binaryFile read
      // path has the same per-file task shape, so this measures the
      // record-framing + gunzip throughput that path pays per archive
      import spark.implicits._
      val n = bigDocs.select(col("doc_id")).as[Long].map { id =>
        val recs = (0 until 10).map { k =>
          val body = ("HTTP/1.1 200 OK\r\n\r\n" + "x" * (50 + k))
            .getBytes("US-ASCII")
          graft.sources.Warc.WarcRecord("response",
            s"https://s$id.com/$k", "2024-01-01T00:00:00Z",
            s"<urn:uuid:$id-$k>", "application/http", 0L, body)
        }
        val archive = graft.sources.Warc.build(recs,
          gzipPerRecord = id % 2 == 0)
        graft.sources.Warc.parseArchive(archive).size.toLong
      }.groupBy().sum().as[Long].collect()(0)
      assert(n == 500000L, s"warc parse lost records: $n")
      n
    }
    timed("jpeg decode 50k") {
      // entropy-coded decode at x10: encode->Huffman/IDCT-decode entirely
      // inside each task (map-only; the features are one thin row per
      // image) — the stage parallelism is the scan's at any corpus size
      import spark.implicits._
      val media = bigDocs
        .select(col("doc_id"), coalesce(col("n_chars"), lit(0L)).as("nc"))
        .as[(Long, Long)].map { case (id, nc) =>
          graft.ext.Multimodal.MediaItem(
            id, graft.ext.Multimodal.synthJpeg(id, nc), "", "smoke")
        }
      val n = graft.ext.Multimodal.decodeRealMedia(media)
        .filter(col("format") === "image/jpeg").count()
      assert(n == 50000L, s"jpeg decode lost rows: $n")
      n
    }

    // ——— interval-overlap join under pathological skew ———
    // the granule decomposition's two failure shapes AT ONCE: a handful
    // of VERY LONG intervals (per-row fan-out = span/width granules) and
    // one HOT granule every right interval covers (one (key, granule)
    // bucket holds the whole right side — the shape the scaladoc's
    // salting note is about; at this scale one in-task hash join absorbs
    // it, beyond it the caller salts upstream). Assertions pin BOTH the
    // arithmetic fan-out contract (explode is per-GRANULE, not per axis
    // unit — a regression to per-unit explode blows the bound 10x) and
    // the exact overlap-pair count (2.2M, keep-once granule semantics).
    timed("interval join skew 300k") {
      val width = 10L
      val left = spark.range(100000L).select(
          col("id").as("l_id"),
          (col("id") * 10).as("l_start"),
          (col("id") * 10 + 8).as("l_end"))
        .unionByName(spark.range(10L).select(
          (col("id") + 1000000L).as("l_id"),
          lit(0L).as("l_start"), lit(100000L).as("l_end")))
      val right = spark.range(200000L).select(
        col("id").as("r_id"),
        (col("id") % 6).as("r_start"),
        ((col("id") % 6) + 4).as("r_end"))
      val lFan = left.agg(sum(
          floor((col("l_end") - 1) / width) - floor(col("l_start") / width)
            + lit(1L))).head().getLong(0)
      assert(lFan == 200000L,
        s"left granule fan-out $lFan != 200000 — per-granule contract broken")
      val pairs = graft.ops.IntervalJoin.overlapJoin(
        left, right, Nil, "l_start", "l_end", "r_start", "r_end", width,
        pinShuffleHash = true)
      val n = pairs.count()
      // 10 long intervals x 200k (all overlap) + l_id 0 [0,8) x 200k
      // (every right starts < 8); every other typical interval starts at
      // >= 10 > max(r_end) = 9
      assert(n == 2200000L, s"overlap pair count $n != 2200000")
      // built-in two-level salting splits the one hot bucket 32 ways
      // (left coverers replicate x32, cold buckets pay nothing) —
      // identical pair count, hot-task work divided
      val nSalted = graft.ops.IntervalJoin.overlapJoin(
        left, right, Nil, "l_start", "l_end", "r_start", "r_end", width,
        saltHotBuckets = 32, hotThreshold = 10000L,
        pinShuffleHash = true).count()
      assert(nSalted == n, s"salted pair count $nSalted != $n")
      n
    }

    // ——— external Arrow embedding worker throughput ———
    // one numpy worker process per IPC batch (scripts/embed_worker.py,
    // bit-identical to stubEmbed — MultimodalSpec pins it); the number to
    // watch is rows/s through the subprocess seam, the serving shape a
    // pooled GPU encoder replaces
    timed("arrow embed worker 500 docs") {
      val media = graft.ext.Multimodal.mediaFromText(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", "smoke")
      graft.ext.Multimodal.embedViaWorker(media,
        Seq("python3", "scripts/embed_worker.py", "16")).count()
    }

    // ——— day-2 incremental composition ———
    // every persisted-state API in ONE day-2 run, the deployment shape a
    // daily corpus increment takes: all day-1 state (minhash signature
    // index, span index, IVF centroids + PQ codebooks, DSIR models,
    // n-gram LM, retrieval index) is FIT AND PERSISTED ONCE up front;
    // the increment then flows through dedup-vs-index → span masking →
    // LM + DSIR scoring → ANN serving → BM25 retrieval touching ONLY
    // the increment's text plus the persisted state — the day-1 corpus
    // text is never re-read in any increment stage.
    {
      val base = java.nio.file.Files
        .createTempDirectory("smoke_day2").toString
      val history = bigDocs.filter(col("doc_id") % 10 =!= 3)
      val increment = docs.filter(col("doc_id") % 10 === 3)
      val histEmb = (0 until 10).map(k =>
        spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
          .withColumn("vec_id", col("vec_id") + lit(k * 100000L)))
        .reduce(_ unionByName _)
      var dsirT: graft.ext.Dsir.HashedModel = null
      var dsirR: graft.ext.Dsir.HashedModel = null
      timed("day1 fit+persist all state") {
        graft.ext.Dedup.writeSignatures(history, "doc_id", "text",
          s"$base/sigs")
        graft.ext.Dedup.writeSpanIndex(history, "doc_id", "text",
          s"$base/spans", n = 20)
        graft.ext.Similarity.writeCentroids(histEmb, "vec_id", "embedding",
          s"$base/cent", numCells = 16, lloydIters = 2)
        graft.ext.Similarity.writePqModel(spark,
          graft.ext.Similarity.trainPq(
            histEmb, "vec_id", "embedding", 8, 16, 2), s"$base/pq")
        graft.ext.TextAnalysis.writeNgramModel(spark,
          graft.ext.TextAnalysis.fitNgramModel(history, "text", n = 4),
          s"$base/lm")
        dsirT = graft.ext.Dsir.fitHashedModel(
          history.filter(col("doc_id") % 17 === 0), "text",
          buckets = 8192, maxN = 2)
        dsirR = graft.ext.Dsir.fitHashedModel(
          history.filter(col("doc_id") % 17 =!= 0), "text",
          buckets = 8192, maxN = 2)
        graft.ext.Retrieval.writeIndex(history, "doc_id", "text",
          s"$base/ret")
        spark.read.parquet(s"$base/sigs").count()
      }
      timed("day2 dedup vs sig index") {
        graft.ext.Dedup.dedupIncrement(increment,
          spark.read.parquet(s"$base/sigs"), "doc_id", "doc_id", "text",
          threshold = 0.5).count()
      }
      timed("day2 span mask vs index") {
        graft.ext.Dedup.dropRepeatedSpansIncrement(increment,
          spark.read.parquet(s"$base/spans"), "doc_id", "text",
          n = 20).count()
      }
      timed("day2 LM + DSIR scoring") {
        val lm = graft.ext.TextAnalysis.readNgramModel(spark, s"$base/lm")
        graft.ext.Dsir.importanceWeights(
          graft.ext.TextAnalysis.scoreNgram(increment, "text", lm),
          "text", dsirT, dsirR).count()
      }
      timed("day2 ANN serve vs models") {
        val incEmb = spark.read
          .parquet("/root/testdata/sf0.1/embeddings.parquet")
          .filter(col("vec_id") % 10 === 3)
        graft.ext.Similarity.ivfPqTopKFromModels(incEmb, histEmb,
          "vec_id", "embedding", 5, s"$base/cent", s"$base/pq").count()
      }
      timed("day2 BM25 vs ret index") {
        import spark.implicits._
        graft.ext.Retrieval.bm25TopKFromIndex(
          spark.read.parquet(s"$base/ret"), "doc_id",
          Seq((1L, "customer data"), (2L, "vector merge"))
            .toDF("query_id", "qtext"), "query_id", "qtext", k = 10).count()
      }
      timed("day1 centroid state persist") {
        graft.ext.Similarity.writeCentroidState(
          histEmb, "embedding", "label", s"$base/centstate_hist")
        spark.read.parquet(s"$base/centstate_hist").count()
      }
      timed("day2 drift vs centroid state") {
        // day-2 cost = the increment's own partials + a KB-scale merge;
        // history vectors are never re-read
        val incEmb = spark.read
          .parquet("/root/testdata/sf0.1/embeddings.parquet")
          .filter(col("vec_id") % 10 === 3)
        graft.ext.Similarity.writeCentroidState(
          incEmb, "embedding", "label", s"$base/centstate_inc")
        graft.ext.Similarity.centroidDriftFromStates(spark,
          Seq(s"$base/centstate_hist", s"$base/centstate_inc"), "label")
          .count()
      }
      // snapshot-audit at the ×10 corpus: diff the full snapshot against
      // an edited derivation (drop/mutate classes), then the incremental
      // drift path — day-1 histogram persisted once, day-2 = its own
      // histogram + a KB merge
      val lenBucket = least(floor(length(col("text")) / lit(200)), lit(9))
        .cast("int")
      timed("snapshot diff x10 corpus") {
        val old = bigDocs.filter(col("doc_id") % 7 =!= 3)
          .withColumn("text", when(col("doc_id") % 11 === 5,
            concat(col("text"), lit(" [stale]"))).otherwise(col("text")))
        graft.ext.SnapshotAudit.snapshotDiff(
            old, bigDocs.filter(col("doc_id") % 5 =!= 4), "doc_id", "text")
          .groupBy(col("status")).count().collect()
        bigDocs.count()
      }
      timed("day1 histogram state persist") {
        graft.ext.SnapshotAudit.writeHistogramState(
          history, "source", lenBucket, s"$base/hist_day1")
        spark.read.parquet(s"$base/hist_day1").count()
      }
      timed("day2 drift vs histogram state") {
        graft.ext.SnapshotAudit.writeHistogramState(
          increment, "source", lenBucket, s"$base/hist_day2")
        graft.ext.SnapshotAudit.distributionDriftFromStates(spark,
          Seq(s"$base/hist_day1"), Seq(s"$base/hist_day1", s"$base/hist_day2"),
          "source").count()
      }
    }
    spark.stop()
  }
}
