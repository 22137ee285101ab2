package graft

import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity
import graft.ext.Similarity.PqModel

/** IVF-PQ (trainPq / encodePq / ivfPqTopK + PqCodes / PqAdcTopK
  * kernels): from-scratch encode/train differentials, the lossless
  * limit (codebooks containing every distinct subvector ⇒ IVF-PQ ==
  * exact brute force), recall on clustered data, shard-split
  * invariance, and the no-vector-shuffle plan contract. */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ——— from-scratch reference (immutable collections, direct math) ———

  private def refCode(v: Seq[Float], cb: Seq[Seq[Float]], base: Int): Int = {
    val dsub = cb.head.length
    cb.zipWithIndex.map { case (c, k) =>
      val d = (0 until dsub).map { j =>
        val diff = v(base + j).toDouble - c(j).toDouble
        diff * diff
      }.sum
      (d, k)
    }.minBy { case (d, k) => (d, k) }._2
  }

  private def refCodes(v: Seq[Float], model: PqModel): Seq[Int] =
    model.codebooks.zipWithIndex.map { case (cb, mi) =>
      refCode(v, cb, mi * model.subDim)
    }

  private def refAdcDot(q: Seq[Float], codes: Seq[Int], model: PqModel): Double =
    model.codebooks.zipWithIndex.map { case (cb, mi) =>
      val c = cb(codes(mi))
      (0 until model.subDim).map(j =>
        q(mi * model.subDim + j).toDouble * c(j).toDouble).sum
    }.sum

  private def norm(v: Seq[Float]): Double =
    math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)

  private def rnd = new scala.util.Random(0x9a11)

  test("encodePq == from-scratch argmin per subspace (fuzz, 40 cases)") {
    val r = rnd
    for (caseId <- 1 to 40) {
      val m = 1 + r.nextInt(4)
      val dsub = 1 + r.nextInt(3)
      val kSub = 1 + r.nextInt(5)
      val dim = m * dsub
      def vec(): Seq[Float] =
        Seq.fill(dim)((r.nextInt(9) - 4).toFloat) // integer-valued
      val model = PqModel(
        Seq.fill(m)(Seq.fill(kSub)(Seq.fill(dsub)((r.nextInt(9) - 4).toFloat))))
      val vecs = (0 until 1 + r.nextInt(8)).map(i => (i.toLong, vec()))
      val got = Similarity.encodePq(
          vecs.toDF("id", "v"), "v", model)
        .select("id", "pq_codes").as[(Long, Seq[Int])]
        .collect().sortBy(_._1)
      vecs.foreach { case (id, v) =>
        assert(got(id.toInt)._2 == refCodes(v, model),
          s"case $caseId id $id: codes mismatch for $v")
      }
    }
  }

  test("trainPq == from-scratch Lloyd with pinned seeds (fuzz, 20 cases)") {
    val r = rnd
    for (caseId <- 1 to 20) {
      val m = 1 + r.nextInt(3)
      val dsub = 1 + r.nextInt(2)
      val dim = m * dsub
      val n = 4 + r.nextInt(8)
      val kSub = 1 + r.nextInt(math.min(4, n))
      // integer-valued floats: double sums are exact in any order, so the
      // distributed avg matches the sequential reference bit-for-bit
      val vecs = (0 until n).map(i =>
        (i.toLong, Seq.fill(dim)((r.nextInt(7) - 3).toFloat)))
      val seeds = (0 until kSub).map(_.toLong)
      val iters = r.nextInt(3)
      val got = Similarity.trainPq(
        vecs.toDF("id", "v"), "id", "v", m, kSub, iters, Some(seeds))
      // reference: same init, assign-all, per-(m,code) per-dim mean
      var cbs: Seq[Seq[Seq[Float]]] = (0 until m).map { mi =>
        seeds.map(s => vecs(s.toInt)._2.slice(mi * dsub, (mi + 1) * dsub))
      }
      for (_ <- 1 to iters) {
        val model = PqModel(cbs)
        val assigned = vecs.map { case (_, v) => (v, refCodes(v, model)) }
        cbs = (0 until m).map { mi =>
          (0 until kSub).map { k =>
            val members = assigned.filter(_._2(mi) == k).map(_._1)
            if (members.isEmpty) cbs(mi)(k)
            else (0 until dsub).map { j =>
              (members.map(_(mi * dsub + j).toDouble).sum / members.size)
                .toFloat
            }
          }
        }
      }
      assert(got.codebooks == cbs,
        s"case $caseId: m=$m dsub=$dsub kSub=$kSub iters=$iters")
    }
  }

  test("lossless limit: codebooks containing every distinct subvector " +
      "make IVF-PQ identical to exact brute force") {
    val r = rnd
    val m = 4
    // vectors assembled from 3 patterns per subspace (dsub = 2)
    val patterns = Seq(Seq(1f, 0f), Seq(0f, 2f), Seq(2f, 1f))
    val vecs = (0 until 40).map { i =>
      (i.toLong, (0 until m).flatMap(_ => patterns(r.nextInt(3))))
    }
    val df = vecs.toDF("id", "v")
    val model = PqModel(Seq.fill(m)(patterns))
    val queries = df.filter(col("id") < 6)
    val exact = Similarity.bruteForceTopK(queries, df, "id", "v", 3)
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2)))
      .sortBy(x => (x._1, x._2))
    val approx = Similarity.ivfPqTopK(queries, df, "id", "v", 3,
        numCells = 1, numProbes = 1, m = m, kSub = 3,
        pqModel = Some(model))
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2)))
      .sortBy(x => (x._1, x._2))
    assert(approx.toSeq == exact.toSeq)
  }

  test("ADC cosine values match the from-scratch LUT computation") {
    val m = 2
    val model = PqModel(Seq(
      Seq(Seq(1f, 0f), Seq(0f, 1f)),
      Seq(Seq(1f, 1f), Seq(2f, 0f))))
    val cands = Seq(
      (10L, Seq(1f, 0f, 1f, 1f)),
      (11L, Seq(0f, 1f, 2f, 0f)),
      (12L, Seq(1f, 0f, 2f, 0f)))
    val queries = Seq((1L, Seq(1f, 1f, 1f, 0f)))
    val out = Similarity.ivfPqTopK(
        queries.toDF("id", "v"), cands.toDF("id", "v"), "id", "v", 3,
        numCells = 1, numProbes = 1, m = m, kSub = 2,
        pqModel = Some(model))
      .select("neighbor_id", "cosine").as[(Long, Double)]
      .collect().toMap
    cands.foreach { case (id, v) =>
      val codes = refCodes(v, model)
      val expected = refAdcDot(queries.head._2, codes, model) /
        (norm(queries.head._2) * norm(v))
      assert(out(id) === expected +- 1e-12, s"candidate $id")
    }
  }

  test("shard split invariance: maxPerShard=1 == one big shard") {
    val r = rnd
    val dim = 8
    val vecs = (0 until 30).map(i =>
      (i.toLong, Seq.fill(dim)((r.nextInt(9) - 4).toFloat)))
    val df = vecs.toDF("id", "v")
    val q = df.filter(col("id") < 5)
    def run(cap: Int) = Similarity.ivfPqTopK(q, df, "id", "v", 4,
        numCells = 2, numProbes = 2, m = 4, kSub = 4,
        seedIds = Some(Seq(0L, 1L)), pqSeedIds = Some((0 until 4).map(_.toLong)),
        maxPerShard = cap)
      .collect().map(x =>
        (x.getLong(0), x.getInt(1), x.getLong(2), x.getDouble(3))).sortBy(x => (x._1, x._2))
    assert(run(1).toSeq == run(1000000).toSeq)
  }

  test("degenerate vectors: zero-norm candidates are skipped, a " +
      "zero-norm query matches nothing (no ±Inf/NaN cosines)") {
    val dim = 8
    val base = (0 until 20).map(i =>
      (i.toLong, Seq.fill(dim)(((i % 5) + 1).toFloat)))
    val zeroCand = (100L, Seq.fill(dim)(0f))
    val df = (base :+ zeroCand).toDF("id", "v")
    val q = df.filter(col("id") < 3)
    val out = Similarity.ivfPqTopK(q, df, "id", "v", 25,
        numCells = 2, numProbes = 2, m = 4, kSub = 4,
        seedIds = Some(Seq(0L, 1L)),
        pqSeedIds = Some((0 until 4).map(_.toLong)))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    assert(!out.exists(_._2 == 100L), "zero-norm candidate must be skipped")
    assert(out.forall(r => !r._3.isNaN && !r._3.isInfinite),
      "no ±Inf/NaN cosine may be emitted")
    // zero-norm query: contributes no result rows at all
    val zq = Seq((200L, Seq.fill(dim)(0f))).toDF("id", "v")
    val zout = Similarity.ivfPqTopK(zq, df, "id", "v", 5,
      numCells = 2, numProbes = 2, m = 4, kSub = 4,
      seedIds = Some(Seq(0L, 1L)),
      pqSeedIds = Some((0 until 4).map(_.toLong)))
    assert(zout.count() == 0L)
  }

  test("recall: clustered candidates — every approx neighbor comes from " +
      "the query's cluster, full result sets") {
    // PQ deliberately quantizes away intra-cluster jitter, so exact-id
    // top-5 overlap is not the meaningful metric at this resolution
    // (all 50 same-cluster members sit within ~4e-4 cosine of each
    // other); the guarantee to pin is CLUSTER recall: the coarse cells
    // + ADC ranking must never surface a cross-cluster neighbor ahead
    // of same-cluster ones for orthogonal, well-separated clusters.
    val r = rnd
    val dim = 16
    val centers = (0 until 4).map(c =>
      Seq.tabulate(dim)(j => if (j % 4 == c) 10f else 0f))
    val vecs = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + (r.nextInt(5) - 2) * 0.1f))
    }
    val df = vecs.toDF("id", "v")
    val q = df.filter(col("id") < 8)
    val approx = Similarity.ivfPqTopK(q, df, "id", "v", 5,
        numCells = 8, numProbes = 4, m = 4, kSub = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(approx.keySet == (0L until 8L).toSet, s"missing queries: $approx")
    approx.foreach { case (qid, ns) =>
      assert(ns.length == 5, s"query $qid returned ${ns.length} neighbors")
      val wrong = ns.filter(_ % 4 != qid % 4)
      assert(wrong.isEmpty,
        s"query $qid (cluster ${qid % 4}) surfaced cross-cluster " +
          s"neighbors $wrong")
    }
  }

  test("plan contract: the candidate vector never crosses an exchange; " +
      "rank is TopK, not Window") {
    val r = rnd
    val dim = 8
    val vecs = (0 until 40).map(i =>
      (i.toLong, Seq.fill(dim)((r.nextInt(9) - 4).toFloat)))
    val df = vecs.toDF("id", "embedding_vec_col")
    val out = Similarity.ivfPqTopK(df.filter(col("id") < 4), df, "id",
      "embedding_vec_col", 3, numCells = 2, numProbes = 2, m = 4, kSub = 4)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"rank tail must be TopK:\n$plan")
    assert(!plan.contains("Window"), s"no Window node expected:\n$plan")
    // every Exchange's output attribute list must be vector-free: the
    // posting shuffle carries (cell, shard, id, codes, norm) only
    val exchanges = plan.split("\n").filter(_.contains("Exchange"))
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("__v")),
      s"an exchange carries the candidate vector:\n$plan")
  }

  test("null / dim-mismatched candidate vectors degrade to ignored " +
      "(no driver NPE from the per-cell count collect)") {
    val dim = 8
    val base = (0 until 20).map(i =>
      (i.toLong, Some(Seq.fill(dim)(((i % 5) + 1).toFloat))))
    val nullCand = (100L, None: Option[Seq[Float]])
    val shortCand = (101L, Some(Seq(1f, 2f))) // wrong dimension
    val df = (base :+ nullCand :+ shortCand).toDF("id", "v")
    val q = base.take(3).toDF("id", "v")
    val out = Similarity.ivfPqTopK(q, df, "id", "v", 25,
        numCells = 2, numProbes = 2, m = 4, kSub = 4,
        seedIds = Some(Seq(0L, 1L)),
        pqSeedIds = Some((0 until 4).map(_.toLong)))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.nonEmpty)
    assert(!out.exists(r => r._2 == 100L || r._2 == 101L),
      "null / dim-mismatched candidates must be ignored, not surfaced")
  }

  test("writePqModel/readPqModel round-trips the codebooks exactly") {
    val r = rnd
    val m = 3; val kSub = 4; val dsub = 2
    val model = PqModel(Seq.fill(m)(Seq.fill(kSub)(
      Seq.fill(dsub)((r.nextInt(9) - 4) * 0.25f))))
    val tmp = java.nio.file.Files.createTempDirectory("pqrt").toString
    Similarity.writePqModel(spark, model, s"$tmp/pq")
    assert(Similarity.readPqModel(spark, s"$tmp/pq").codebooks
      == model.codebooks)
  }

  test("serving from persisted models == direct ivfPqTopK, exactly") {
    val r = rnd
    val dim = 8
    val vecs = (0 until 40).map(i =>
      (i.toLong, Seq.fill(dim)((r.nextInt(9) - 4).toFloat)))
    val df = vecs.toDF("id", "v")
    val q = df.filter(col("id") < 5)
    val seeds = Some(Seq(0L, 1L))
    val pqSeeds = Some((0 until 4).map(_.toLong))
    def sorted(out: org.apache.spark.sql.DataFrame) = out.collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getDouble(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    val direct = sorted(Similarity.ivfPqTopK(q, df, "id", "v", 4,
      numCells = 2, numProbes = 2, m = 4, kSub = 4,
      seedIds = seeds, pqSeedIds = pqSeeds))
    val tmp = java.nio.file.Files.createTempDirectory("pqserve").toString
    Similarity.writeCentroids(df, "id", "v", s"$tmp/cent",
      numCells = 2, lloydIters = 2, seedIds = seeds)
    Similarity.writePqModel(spark,
      Similarity.trainPq(df, "id", "v", 4, 4, 2, pqSeeds), s"$tmp/pq")
    val served = sorted(Similarity.ivfPqTopKFromModels(q, df, "id", "v", 4,
      s"$tmp/cent", s"$tmp/pq", numProbes = 2))
    assert(served == direct)
  }

  test("encodePq refuses an existing output column") {
    val df = Seq((1L, Seq(1f, 0f))).toDF("id", "pq_codes")
    val model = PqModel(Seq(Seq(Seq(1f, 0f))))
    val e = intercept[IllegalArgumentException] {
      Similarity.encodePq(
        df.withColumnRenamed("pq_codes", "v").withColumn("pq_codes", lit(1)),
        "v", model)
    }
    assert(e.getMessage.contains("pq_codes"))
  }
}
