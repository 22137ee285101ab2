package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.UrlOps

/** URL/domain curation family (ext/UrlOps.scala): host extraction over the
  * crawl-shaped URL variants, registered-domain labeling incl. multi-label
  * public suffixes, blocklist semantics (predicate + anti-join forms), the
  * per-host cap, and the plan contracts — extraction must be map-only, the
  * table blocklist must broadcast, the cap must not plan a Window. */
class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def urls = Seq(
    (1L, "https://www.example.com/path?q=1"),
    (2L, "http://sub.a.example.co.uk:8080/x"),
    (3L, "//cdn.example.com/asset.js"),             // scheme-relative
    (4L, "https://user:pw@secret.example.com/in"),  // userinfo
    (5L, "ftp://files.example.org/pub"),            // other scheme
    (6L, "https://localhost/dev"),                  // single label
    (7L, "HTTPS://UPPER.EXAMPLE.COM/Y"),            // case
    (8L, "not a url at all"),                       // unparseable
    (9L, "https://10.1.2.3:443/ip")                 // IP host
  ).toDF("doc_id", "url")

  test("host: scheme-optional, strips userinfo/port/path, lowercases") {
    val got = urls.select(col("doc_id"), UrlOps.host(col("url")).as("h"))
      .as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("www.example.com"))
    assert(got(2L).contains("sub.a.example.co.uk"))
    assert(got(3L).contains("cdn.example.com"))
    assert(got(4L).contains("secret.example.com"))
    assert(got(5L).contains("files.example.org"))
    assert(got(6L).contains("localhost"))
    assert(got(7L).contains("upper.example.com"))
    assert(got(8L).isEmpty, "non-URL text must yield NULL, not a bogus host")
    assert(got(9L).contains("10.1.2.3"))
  }

  test("registeredDomain: 2 labels, 3 over multi-label suffixes, passthrough") {
    val got = urls
      .select(col("doc_id"),
        UrlOps.registeredDomain(UrlOps.host(col("url"))).as("d"))
      .as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("example.com"))
    assert(got(2L).contains("example.co.uk"), "co.uk takes one extra label")
    assert(got(3L).contains("example.com"))
    assert(got(6L).contains("localhost"), "single-label host passes through")
    assert(got(8L).isEmpty)
    // a bare public suffix has no registrable part — last-2 passthrough
    val bare = Seq((0L, "https://co.uk/")).toDF("doc_id", "url")
      .select(UrlOps.registeredDomain(UrlOps.host(col("url"))).as("d"))
      .as[String].head()
    assert(bare == "co.uk")
  }

  test("dropBlockedDomains (list form): scan predicate, nulls survive") {
    val kept = UrlOps.dropBlockedDomains(urls, "url", Seq("example.com"))
      .select("doc_id").as[Long].collect().sorted
    // 1,3,4,7 are example.com (www/cdn/secret/upper hosts) -> dropped;
    // the unparseable doc 8 (null domain) must SURVIVE a blocklist
    assert(kept.toSeq == Seq(2L, 5L, 6L, 8L, 9L))
    val plan = UrlOps.dropBlockedDomains(urls, "url", Seq("example.com"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"the list blocklist must be a pure scan predicate:\n$plan")
  }

  test("dropBlockedDomains (table form): broadcast anti-join, same rows") {
    val bl = Seq("example.com").toDF("domain")
    val out = UrlOps.dropBlockedDomains(urls, "url", bl, "domain")
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 5L, 6L, 8L, 9L))
    assert(out.columns.toSeq == urls.columns.toSeq,
      "anti-join form must return the input schema unchanged")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"table blocklist must broadcast-anti-join, corpus side unshuffled:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not sort-merge against a KB blocklist:\n$plan")
  }

  test("domainStats aggregates docs/hosts/tokens per registered domain") {
    val docs = urls.withColumn("text",
      when(col("doc_id") <= 4, lit("a b c")).otherwise(lit("  x ")))
    val got = UrlOps.domainStats(docs, "url", "text")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // example.com: docs 1,3,4,7 over hosts www/cdn/secret/upper
    assert(got("example.com") == ((4L, 4L, 10L)))
    assert(got("example.co.uk") == ((1L, 1L, 3L)))
    // token definition is the standardized non-empty count: "  x " = 1
    assert(got("localhost") == ((1L, 1L, 1L)))
    assert(got.contains(null.asInstanceOf[String]) == false ||
      got(null.asInstanceOf[String])._1 == 1L) // unparseable rolls to null
  }

  test("capPerHost keeps k per host in deterministic priority order") {
    // 12 docs on one host, 1 on another
    val many = (1L to 12L).map(i => (i, "https://big.example.com/" + i)) :+
      (100L, "https://small.example.org/")
    val df = many.toDF("doc_id", "url")
    val out = UrlOps.capPerHost(df, "url", "doc_id", k = 3)
    val byHost = out.select("host", "doc_id", "rank")
      .as[(String, Long, Int)].collect().groupBy(_._1)
    assert(byHost("big.example.com").length == 3)
    assert(byHost("small.example.org").map(_._2).toSeq == Seq(100L))
    // rank order replays the md5 priority (portable: same as the oracle)
    val expect = (1L to 12L).sortBy(i =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:42".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, i)).take(3)
    assert(byHost("big.example.com").sortBy(_._3).map(_._2).toSeq == expect)
    // determinism across reruns and seeds switch the selection
    val out2 = UrlOps.capPerHost(df, "url", "doc_id", k = 3, seed = "43")
    assert(out2.count() == 4L)
  }

  test("capPerHost keeps null-host docs uncapped with rank NULL") {
    // 5 unparseable URLs + 4 docs on one host, k=2: every null-host doc
    // must survive (the cap only acts on what it can attribute — same
    // contract as dropBlockedDomains / dropLowQualityDomains), never
    // pooled into one capped NULL group
    val rows = (1L to 5L).map(i => (i, s"no url here $i")) ++
      (10L to 13L).map(i => (i, "https://one.example.com/" + i))
    val out = UrlOps.capPerHost(rows.toDF("doc_id", "url"), "url", "doc_id", 2)
      .select("doc_id", "host", "rank")
      .as[(Long, Option[String], Option[Int])].collect()
    val (nulls, hosted) = out.partition(_._2.isEmpty)
    assert(nulls.map(_._1).sorted.toSeq == (1L to 5L))
    assert(nulls.forall(_._3.isEmpty))
    assert(hosted.length == 2 && hosted.forall(_._2.contains("one.example.com")))
  }

  test("dropLowQualityDomainsNarrow == dropLowQualityDomains projected " +
      "to keepCols; one scoring pass in the plan") {
    val rnd = new scala.util.Random(5)
    val docs = (0 until 80).map { i =>
      (i.toLong, s"https://site${i % 8}.com/p/$i", s"lang${i % 3}",
        rnd.nextDouble())
    }.toDF("doc_id", "url", "lang", "score")
      // a couple of unparseable/null URLs must survive both forms
      .unionByName(Seq((100L, null.asInstanceOf[String], "lang0", 0.01),
        (101L, "not a url", "lang1", 0.02)).toDF("doc_id", "url", "lang", "score"))
    val full = UrlOps.dropLowQualityDomains(docs, "url", "score", 0.5)
      .select("doc_id", "lang", "score")
    val narrow = UrlOps.dropLowQualityDomainsNarrow(
      docs, "url", "score", 0.5, keepCols = Seq("doc_id", "lang"))
    assert(narrow.columns.toSeq == Seq("doc_id", "lang", "score"))
    assert(narrow.collect().map(_.toSeq).toSet ===
      full.collect().map(_.toSeq).toSet)
    // the anti-join probe must read the checkpoint blocks, not rescan
    val plan = narrow.queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD"),
      s"narrow gate no longer reads a materialized score frame:\n$plan")
  }

  test("plan: extraction is map-only; cap plans TopK, not Window") {
    val parts = UrlOps.withUrlParts(urls, "url")
    parts.collect()
    val extractPlan = parts.queryExecution.executedPlan.toString
    assert(!extractPlan.contains("Exchange"),
      s"host/domain extraction must never shuffle the corpus:\n$extractPlan")
    val cap = UrlOps.capPerHost(urls, "url", "doc_id", k = 2)
    cap.collect()
    val capPlan = cap.queryExecution.executedPlan.toString
    assert(capPlan.contains("TopKPerGroup") && !capPlan.contains("Window"),
      s"the host cap must use the bounded-heap operator:\n$capPlan")
  }

  test("withUrlParts / capPerHost refuse colliding column names") {
    val hasHost = urls.withColumn("host", lit("x"))
    assert(intercept[IllegalArgumentException](
      UrlOps.withUrlParts(hasHost, "url")).getMessage.contains("host"))
    assert(intercept[IllegalArgumentException](
      UrlOps.capPerHost(hasHost, "url", "doc_id", 1)).getMessage.contains("host"))
  }

  test("canonicalUrl: case, default ports, userinfo, fragment, tracker " +
      "params and param order all collapse; the rest is preserved") {
    val cases = Seq(
      // case + default https port + tracker + unsorted params + fragment
      ("HTTPS://WWW.Example.COM:443/A/b?z=1&utm_source=x&a=2#frag",
        "https://www.example.com/A/b?a=2&z=1"),
      // http default port; userinfo stripped; empty path -> /
      ("http://u:pw@site.org:80?b=1", "http://site.org/?b=1"),
      // NON-default port preserved; gclid dropped; all-tracker query
      // drops the '?' entirely
      ("https://h.net:8443/p?gclid=abc&utm_campaign=c", "https://h.net:8443/p"),
      // scheme-relative stays scheme-relative
      ("//cdn.site.com/x?a=1", "//cdn.site.com/x?a=1"),
      // ref is a tracking key; REF= matches case-insensitively
      ("https://a.io/p?REF=home&k=v", "https://a.io/p?k=v"),
      // path case and duplicate params are PRESERVED (identity, not
      // content, must be conservative)
      ("https://a.io/P?x=2&x=1", "https://a.io/P?x=1&x=2"),
      // unparseable -> null
      ("not a url", null))
    val got = cases.map(_._1).toDF("url")
      .select(UrlOps.canonicalUrl(col("url"))).as[String].collect().toSeq
    assert(got == cases.map(_._2), s"got $got")
  }

  test("domainSplit: all pages of a domain co-assign; unparseable URLs " +
      "fall back to per-row units; reseeding redraws") {
    val df = (0 until 400).map { i =>
      (i.toLong, s"https://sub$i.site${i % 20}.com/page/$i")
    }.toDF("doc_id", "url")
    val split = UrlOps.domainSplit(df, "url")
    // leakage invariant: one split per registered domain, over ALL rows
    val perDomain = split.groupBy("split_unit")
      .agg(countDistinct(col("split")).as("n"))
      .select("n").as[Long].collect()
    assert(perDomain.forall(_ == 1L),
      "a domain straddles the train/eval boundary")
    assert(split.select("split_unit").distinct().count() == 20)
    // every label present somewhere across reseeds; default seed is
    // deterministic run-to-run
    val a = split.select("doc_id", "split").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    val b = UrlOps.domainSplit(df, "url").select("doc_id", "split")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(a == b, "same seed must reproduce the assignment")
    val re = UrlOps.domainSplit(df, "url", seed = "epoch2")
      .select("doc_id", "split").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(re != a, "reseeding should redraw the domain assignment")
    // unparseable URLs: each row is its own unit, still deterministic
    val junk = Seq((1L, Some("garbage")), (2L, Some("garbage")),
      (3L, Some("other junk")), (4L, None))
      .toDF("doc_id", "url")
    val j = UrlOps.domainSplit(junk, "url")
      .select("doc_id", "split_unit", "split")
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getString(2))))
      .toMap
    assert(j(1L)._1 == "garbage" && j(2L)._1 == "garbage"
      && j(3L)._1 == "other junk")
    // NULL url: conservative side of the boundary, never into training
    assert(j(4L) == ((null, "test")))
    // share sanity at domain grain: train strictly largest at 80/10/10
    val counts = split.select("split_unit", "split").distinct()
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.getOrElse("train", 0L) > counts.getOrElse("val", 0L))
  }

  test("dedupByCanonicalUrl keeps first per canonical form and passes " +
      "unparseable-URL rows through untouched") {
    val df = Seq(
      (1L, "https://s.com/p?utm_source=a"),
      (2L, "HTTPS://S.COM:443/p"),      // same canonical as 1 -> dropped
      (3L, "https://s.com/q"),
      (4L, "garbage"),                   // unparseable: kept
      (5L, "more garbage"),              // unparseable: kept
      (5L, "more garbage"),              // FULL-ROW duplicate: collapses
      (6L, "more garbage")               // same url, distinct row: kept
    ).toDF("doc_id", "url")
    val out = UrlOps.dedupByCanonicalUrl(df, "url", "doc_id")
    val got = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 3L, 4L, 5L, 6L))
    // single-pass plan contract (round-18 verdict: the filter/union
    // shape scanned and canonicalized the corpus TWICE): exactly one
    // Exchange — the dedup aggregate's — and no Union anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"two-branch plan resurfaced:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"expected exactly one Exchange:\n$plan")
  }
}
