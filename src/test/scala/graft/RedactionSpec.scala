package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Redaction

/** PII-redaction gate (ext/Redaction.scala): rule behavior on a seeded
  * fixture corpus, and the map-only plan contract — the corpus must never
  * shuffle to be redacted. */
class RedactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = Seq(
    (1L, "reach me at jane.doe+spam@corp.example.org today"),
    (2L, "call +1-202-555-0142 or +44-201-555-0199 tonight"),
    (3L, "ssn 123-45-6789 on file; backup 987-65-4321"),
    (4L, "server 192.168.0.1 and 10.255.3.77 replied"),
    (5L, "mixed: a@b.io +1-303-555-0000 111-22-3333 8.8.8.8"),
    (6L, "no pii here, just 12345 and 1-2-3 and v2.1 text"),
    (7L, "id-adjacent 1234-56-7890 must NOT match the ssn rule"))
    .toDF("doc_id", "text")

  test("each default rule redacts its seeded patterns and counts them") {
    val out = Redaction.redact(fixture, "text").orderBy("doc_id")
      .select("doc_id", "redacted", "n_email", "n_phone", "n_id", "n_ipv4")
      .as[(Long, String, Int, Int, Int, Int)].collect().toSeq
    assert(out(0) == ((1L, "reach me at <EMAIL> today", 1, 0, 0, 0)))
    assert(out(1) == ((2L, "call <PHONE> or <PHONE> tonight", 0, 2, 0, 0)))
    assert(out(2) == ((3L, "ssn <ID> on file; backup <ID>", 0, 0, 2, 0)))
    assert(out(3) == ((4L, "server <IP> and <IP> replied", 0, 0, 0, 2)))
    assert(out(4) == ((5L, "mixed: <EMAIL> <PHONE> <ID> <IP>", 1, 1, 1, 1)))
    assert(out(5) == ((6L, "no pii here, just 12345 and 1-2-3 and v2.1 text",
      0, 0, 0, 0)))
    // \b anchors: 1234-56-7890 contains the 3-2-4 shape only mid-digit-run
    assert(out(6) == ((7L, "id-adjacent 1234-56-7890 must NOT match the ssn rule",
      0, 0, 0, 0)))
  }

  test("rule order protects later rules from partial rewrites") {
    // the phone +1-202-555-0142: after <PHONE> replacement nothing
    // id-shaped remains; with the id rule alone the digits survive intact
    // (no spurious partial match inside the phone — anchored shapes)
    val idOnly = Redaction.redact(fixture.filter($"doc_id" === 2), "text",
      rules = Seq(Redaction.NationalId))
      .select("redacted").as[String].head()
    assert(idOnly == "call +1-202-555-0142 or +44-201-555-0199 tonight")
  }

  test("redaction is map-only: no exchange, stays in one codegen span") {
    val red = Redaction.redact(fixture, "text")
    red.collect() // finalize any adaptive plan before reading it
    val plan = red.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"the redaction gate must never shuffle the corpus:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SerializeFromObject"),
      s"the redaction gate must be pure column expressions, not UDFs:\n$plan")
  }

  test("duplicate rule names are rejected (they key the count columns)") {
    val dup = Seq(Redaction.Email, Redaction.Email)
    val e = intercept[IllegalArgumentException](
      Redaction.redact(fixture, "text", rules = dup))
    assert(e.getMessage.contains("unique"))
  }

  test("counts can be disabled; redacted column alone is appended") {
    val out = Redaction.redact(fixture, "text", counts = false)
    assert(out.columns.toSeq == Seq("doc_id", "text", "redacted"))
  }

  test("existing outCol / n_<rule> columns collide loudly, never overwrite") {
    // a corpus already carrying an n_email audit column must not be
    // silently corrupted by withColumn's replace semantics
    val withAudit = fixture.withColumn("n_email", lit(99))
    val e1 = intercept[IllegalArgumentException](
      Redaction.redact(withAudit, "text"))
    assert(e1.getMessage.contains("n_email"))
    val withOut = fixture.withColumn("redacted", lit("x"))
    val e2 = intercept[IllegalArgumentException](
      Redaction.redact(withOut, "text"))
    assert(e2.getMessage.contains("redacted"))
    // counts=false ignores count-column clashes (none are appended)
    assert(Redaction.redact(withAudit, "text", counts = false)
      .columns.contains("redacted"))
  }
}
