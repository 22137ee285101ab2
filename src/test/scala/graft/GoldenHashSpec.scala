package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates the self-oracle for the non-SQL-expressible queries: each
  * production hash path (minhash/simhash signatures, LSH/IVF top-k,
  * approx distinct) must reproduce its committed content hash at
  * sf0.001 — a value regression that the driver's rows-only check would
  * miss fails HERE. Regenerate goldens only for an intended change
  * (GoldenHashes scaladoc). */
class GoldenHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val SfDir = "/root/testdata/sf0.001"

  test("every golden query has a committed hash for all three test SFs") {
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val have = GoldenHashes.expected.getOrElse(sf, Map.empty).keySet
      assert(have == GoldenHashes.queries.toSet,
        s"$sf goldens incomplete: missing ${GoldenHashes.queries.toSet -- have}")
    }
  }

  GoldenHashes.queries.foreach { name =>
    test(s"$name reproduces its committed content hash at sf0.001") {
      val fn = SparkEntry.queries(name)
      val (hash, exp, ok) = GoldenHashes.check(name, "sf0.001", fn(spark, SfDir))
      assert(exp.nonEmpty, s"no committed golden for $name at sf0.001")
      assert(ok, s"$name content hash $hash != committed ${exp.get} — a " +
        "value change in a production hash path (regenerate goldens ONLY " +
        "if the change is intended)")
    }
  }
}
