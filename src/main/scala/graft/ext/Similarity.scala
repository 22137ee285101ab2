package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), north-star extension (SURVEY.md §7.1 module `ext`).
  *
  * Two tiers:
  *  - brute-force cosine top-k — exact baseline; the candidate side is
  *    shuffled once on the (small) query set, dot products run inside
  *    codegen'd higher-order functions;
  *  - LSH-bucketed top-k — scale path: random-hyperplane signatures bucket
  *    the corpus so each query only scores its bucket (multi-probe via
  *    several independent tables).
  */
object Similarity {

  /** Registers `fvec_dot`/`fvec_norm` for SQL-string callers. The DSL
    * paths below do NOT require it: they construct the native expression
    * nodes directly via the bridge. */
  def enableNative(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.VectorFunctions.register(spark)

  import org.apache.spark.sql.GraftColumnBridge.{column => exprCol, expression}

  /** Dot product of two float-array columns in float64, summed in array
    * order — always the native codegen'd kernel ([[graft.functions
    * .FloatVecDot]]); bit-identical to the interpreted
    * `aggregate(zip_with(...))` HOF form (proven in ScaleOpsSpec) with
    * ~no per-element overhead. */
  def dot(a: Column, b: Column): Column =
    exprCol(graft.functions.FloatVecDot(expression(a), expression(b)))

  /** L2 norm of a float-array column in float64 — native kernel. */
  def l2Norm(a: Column): Column =
    exprCol(graft.functions.FloatVecNorm(expression(a)))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Shared top-k tail for the three search paths: the custom bounded-heap
    * operator ([[graft.ops.TopK.perGroupRanked]]) keeps the k best scored
    * candidates per query WITHOUT sorting the full scored set (the window
    * form sorts every group — the dominant cost once |Q|·|candidates|
    * grows) and emits the rank from the final heap drain — no Window node
    * anywhere in the plan. Output is identical to the pure-window form:
    * the ordering is total (cosine desc, neighbor_id). */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    graft.ops.TopK.perGroupRanked(
        scored, Seq("query_id"), Seq(col("cosine").desc, col("neighbor_id")), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))

  /** Brute-force cosine top-k: every query row against every candidate row.
    * Norms are precomputed on each side before the join so the O(|Q|·|C|)
    * stage does one fused multiply-add pass per pair and nothing else.
    * Use only with a bounded query set; the LSH variant is the corpus-scale
    * path.
    */
  def bruteForceTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv"),
      l2Norm(col(vecCol)).as("__qn"))
    val c = candidates.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      l2Norm(col(vecCol)).as("__cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
    rankTopK(scored, k)
  }

  /** Hard-negative mining — the contrastive-training data op: for each
    * query vector, the k MOST similar candidates whose label differs
    * (null-safe: `IS DISTINCT FROM` semantics, so null-labeled rows pair
    * with everything labeled) — the "hardest" negatives an embedding
    * model trains against (in-batch negatives are too easy; the
    * near-boundary ones carry the gradient). Same broadcast-queries
    * nested-loop shape as [[bruteForceTopK]] with the label exclusion
    * fused into the scoring pass (never materializing same-label pairs),
    * bounded-heap rank; at corpus scale generate candidates with the
    * IVF/LSH paths and apply the same exclusion before the re-rank.
    * Returns (query_id, rank, neighbor_id, neighbor_label, cosine). */
  def hardNegatives(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val q = queries.select(
      col(idCol).as("query_id"), col(labelCol).as("__ql"),
      col(vecCol).as("__qv"), l2Norm(col(vecCol)).as("__qn"))
    val c = candidates.select(
      col(idCol).as("neighbor_id"), col(labelCol).as("neighbor_label"),
      col(vecCol).as("__cv"), l2Norm(col(vecCol)).as("__cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(!(col("neighbor_label") <=> col("__ql")))
      .withColumn("cosine",
        cosine(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
    graft.ops.TopK.perGroupRanked(
        scored, Seq("query_id"), Seq(col("cosine").desc, col("neighbor_id")), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("neighbor_label"), col("cosine"))
  }

  /** Random-hyperplane LSH signature: `numBits` sign bits of dot products
    * with seeded Gaussian hyperplanes, packed into a long.
    *
    * Each plane is a `typedLit` DATA literal (array<double>) fed to the
    * native [[graft.functions.FloatDoubleVecDot]] kernel — one codegen'd
    * primitive loop per plane, `numBits` expression nodes total, so the
    * plan stays KB-sized (the fully unrolled multiply-add form built
    * 2048-term trees and 6 MiB task binaries, and the earlier nested
    * `aggregate`/`zip_with` HOF form evaluated every element through the
    * interpreter — the whole cost of the signature stage). Null/length
    * semantics and float64 array-order accumulation are bit-identical to
    * both earlier forms: null or length-mismatched vectors yield dot NULL,
    * `when(NULL > 0)` takes the otherwise-branch, so every bit is 0 and
    * the signature is 0 — and a DuckDB oracle embedding the same plane
    * literals re-derives identical signs. */
  def hyperplaneSignature(vec: Column, dim: Int, numBits: Int, seed: Long): Column = {
    val rnd = new scala.util.Random(seed)
    val planes: Seq[Seq[Double]] = Seq.fill(numBits)(Seq.fill(dim)(rnd.nextGaussian()))
    planes.zipWithIndex.map { case (p, b) =>
      when(exprCol(graft.functions.FloatDoubleVecDot(
        expression(vec), expression(typedLit(p)))) > 0, lit(1L << b))
        .otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: `numTables` independent signatures;
    * query joins candidates on (table, signature) equality, then exact
    * cosine re-ranks within the candidate union. Each join is an equi-join
    * on a bounded key — no cross join at any scale.
    */
  def lshTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      numBits: Int = 12,
      numTables: Int = 4,
      seed: Long = 42L): DataFrame = {
    // candidate generation runs on (id, table, sig) rows ONLY — embeddings
    // never enter the signature explode, the bucket join, or the pair
    // distinct. The earlier form carried the vector through all three, so
    // every corpus vector crossed the bucket exchange numTables times and
    // the multi-table dedup shuffled full vectors; here the exchanges move
    // ~24-byte rows and the vectors ship exactly once, in the final
    // score join-backs.
    def sigsOf(df: DataFrame, side: String): DataFrame = {
      val sigs = (0 until numTables).map(t =>
        struct(lit(t).as("table_id"),
          hyperplaneSignature(col(vecCol), dim, numBits, seed + t).as("sig")))
      df.select(col(idCol).as(s"${side}_id"), explode(array(sigs: _*)).as("__t"))
        .select(col(s"${side}_id"), col("__t.table_id"), col("__t.sig"))
    }
    val cand = sigsOf(queries, "query")
      .join(sigsOf(candidates, "neighbor"), Seq("table_id", "sig"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      l2Norm(col(vecCol)).as("__qn"))
    val c = candidates.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), l2Norm(col(vecCol)).as("__cn"))
    // the query set is bounded by contract (same as bruteForceTopK), so
    // its vectors broadcast; candidate vectors ship once, in the one
    // shuffle join-back on neighbor_id
    rankTopK(
      cand.join(broadcast(q), "query_id").join(c, "neighbor_id")
        .withColumn("cosine",
          cosine(col("__qv"), col("__cv"), col("__qn"), col("__cn"))),
      k)
  }

  /** IVF (inverted-file) approximate top-k — the other scale path next to
    * [[lshTopK]]: partition the corpus into `numCells` Voronoi cells around
    * trained centroids; each query scores only the `numProbes` nearest
    * cells.
    *
    * Training is Lloyd's iterations expressed as DataFrame aggregates;
    * centroids live driver-side (numCells × dim floats — KBs) and are
    * re-broadcast as literals each iteration. All per-element math runs in
    * the native [[dot]]/[[l2Norm]] kernels: the assignment argmin uses
    * dist² ∝ |c|² − 2·v·c (the |v|² term is constant per row), so each
    * centroid distance is ONE fused dot product instead of an interpreted
    * `zip_with` difference-square fold. The centroid update is dim
    * per-dimension `avg(element_at(...))` aggregates — a single shuffle of
    * partial means that distributes at any corpus size, never a
    * `collect_list` of whole vectors into one task. Candidate scoring
    * joins on the cell id — never a full cross join.
    */
  /** @param seedIds when set, centroids initialize from these candidate
    *                 ids' vectors IN THE GIVEN ORDER (cell i = ids(i)) and
    *                 `numCells` is ignored. This makes the whole operator —
    *                 seeding, Lloyd's updates, assignment, probing, re-rank
    *                 — recomputable by an external engine from the same
    *                 parquet (the portable-oracle pattern; the default
    *                 xxhash64-ordered sample is engine-specific). */
  /** Deterministic per-group mean of float vectors — the fix for the
    * round-4 determinism caveat (closed round-18): a FIXED-SHAPE 4096-ary
    * tree sum keyed by the row id's 12-bit groups. Level `l` groups rows
    * by `id >>> 12·l` and left-folds each group's partials in ascending
    * previous-key order from an explicit zero vector, so the reduction
    * shape is a pure function of the id set — independent of partition
    * count, partial-merge order, task scheduling, OR ENGINE. DuckDB
    * replays the identical tree (`list_reduce(list_prepend(zeros,
    * list(a ORDER BY k)), +)` per level), and running EXTRA levels is a
    * bitwise identity (a singleton fold is `0.0 + x = x`), so the oracle
    * can pin a fixed 6-level unroll (72 ≥ 64 id bits) while this side
    * adapts depth to `max(id)`.
    *
    * Scale: every group at every level holds ≤ 4096 rows by construction
    * (a 12-bit id slice), each level shrinks the frame 4096×, and depth
    * is ⌈bits(maxId)/12⌉ — at the test SFs that is ONE level (one
    * shuffle, the same count the old nondeterministic `avg` paid).
    *
    * Input: `groupCols ++ (__tid bigint — unique per row, __tv
    * array<float>)`; output: `groupCols :+ (__mean array<float>, __n
    * bigint)` — the double sum ÷ count, float-cast (the materialized
    * centroid dtype). */
  private[graft] def treeMeans(
      rows: DataFrame, groupCols: Seq[String], dim: Int,
      maxIdHint: Option[Long] = None): DataFrame = {
    val shiftBits = 12
    // depth from the id range. `maxIdHint` lets iterative callers
    // (trainCentroids/trainPq) compute it ONCE on the raw id frame —
    // without it this aggregate re-evaluates the whole upstream lineage
    // (the assignment kernel) once more per call (review round 18).
    // IMPORTANT: 6 is both the DuckDB unroll depth and the hard cap —
    // `id >>> 12` applied iteratively zeroes ANY long (negative ids
    // included) in 6 rounds, whereas a single `>>> 12·levels` shift
    // masks the distance mod 64 and a naive while-loop on it never
    // terminates for ids ≥ 2^60 (review round 18). Negative ids get a
    // correct fixed-depth tree here, but the cross-engine oracle replay
    // contract is nonnegative ids (DuckDB's `>>` is arithmetic).
    val maxLevels = 6
    val maxId = maxIdHint.getOrElse(
      rows.agg(max(col("__tid"))).head() match {
        case r if r.isNullAt(0) => 0L // empty input → empty output below
        case r => r.getLong(0)
      })
    val levels =
      if (maxId < 0) maxLevels
      else math.max(1, math.min(maxLevels,
        (64 - java.lang.Long.numberOfLeadingZeros(maxId) + shiftBits - 1)
          / shiftBits))
    val zeros = array_repeat(lit(0.0d), lit(dim))
    var cur = rows.select(
      (groupCols.map(col) :+ col("__tid").as("__k") :+
        col("__tv").cast("array<double>").as("__a") :+
        lit(1L).as("__n")): _*)
    (1 to levels).foreach { _ =>
      cur = cur
        .withColumn("__k2", shiftrightunsigned(col("__k"), shiftBits))
        .groupBy((groupCols :+ "__k2").map(col): _*)
        .agg(
          aggregate(
            transform(
              array_sort(collect_list(struct(col("__k"), col("__a")))),
              x => x("__a")),
            zeros,
            (acc, v) => zip_with(acc, v, (p, q) => p + q)).as("__a"),
          sum(col("__n")).as("__n"))
        .withColumnRenamed("__k2", "__k")
    }
    cur.select((groupCols.map(col) :+
      transform(col("__a"), x => (x / col("__n")).cast("float")).as("__mean")
      :+ col("__n")): _*)
  }

  /** Lloyd centroid training over a `(__id, __v)` frame — the shared core
    * of [[ivfTopK]] and [[assignCells]]. Seeds from explicit ids
    * (portable) or a deterministic hash-ordered sample; each iteration
    * assigns via the [[graft.functions.NearestCentroids]] kernel and
    * recomputes per-cell per-dimension means through [[treeMeans]] — a
    * deterministic fixed-shape tree sum, so the update is bitwise
    * reproducible across runs, partitionings, and engines (the
    * sim_ivf_portable oracle replays the identical tree in DuckDB). The
    * centroid matrix is KBs and lives driver-side like the unigram
    * model. */
  /** The `(__id, __v)` candidate frame every trainer/server iterates over.
    * Deliberately NOT [[graft.ops.Par.fanOutSmallScan]]-fanned (round-19
    * measurement): unlike the text-hashing kernels (0.3-1.5 s single-task
    * at bench scale), a Lloyd/PQ assignment pass over a sub-split input
    * is ~70 ms of vector math — splitting it into defaultParallelism
    * micro-tasks made the whole sim family 1.2-1.7× SLOWER (scheduling
    * floor × passes × the persist's extra exchange). At corpus scale the
    * scan is wide on its own and the question is moot. */
  private def vecsFrame(
      candidates: DataFrame, idCol: String, vecCol: String): DataFrame =
    candidates.select(col(idCol).as("__id"), col(vecCol).as("__v"))

  private def trainCentroids(
      vecs: DataFrame,
      numCells: Int,
      lloydIters: Int,
      seedIds: Option[Seq[Long]]): Array[Seq[Float]] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    var centroids: Array[Seq[Float]] = seedIds match {
      case Some(ids) =>
        val byId = vecs.filter(col("__id").isin(ids: _*))
          .as[(Long, Seq[Float])].collect().toMap
        ids.map(id => byId.getOrElse(id,
          throw new IllegalArgumentException(
            s"seed id $id not present in candidates"))).toArray
      case None => vecs
        .withColumn("__r", xxhash64(col("__id")))
        .orderBy("__r").limit(numCells)
        .select("__v").as[Seq[Float]].collect()
    }
    val dim = centroids.headOption.map(_.length).getOrElse(0)
    // tree depth from the RAW id frame, once — keeps the per-iteration
    // treeMeans from re-running the assignment kernel for max(id)
    val maxId = if (lloydIters > 0)
      vecs.agg(max(col("__id"))).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    else 0L
    (1 to lloydIters).foreach { _ =>
      // nearestCell is NULL for null/dim-mismatched vectors — such rows
      // must not form a null-key group (getInt(0) would NPE) and must not
      // pull centroid means; they are simply never assignable.
      val updated = treeMeans(
        vecs
          .withColumn("__cell", nearestCell(col("__v"), centroids))
          .filter(col("__cell").isNotNull)
          .select(col("__cell"), col("__id").as("__tid"),
            col("__v").as("__tv")),
        Seq("__cell"), dim, maxIdHint = Some(maxId)).collect()
      updated.foreach { row =>
        centroids(row.getInt(0)) = row.getSeq[Float](1)
      }
    }
    centroids
  }

  /** Argmin over the broadcast centroid list: |c|² − 2·v·c, as ONE native
    * kernel node ([[graft.functions.NearestCentroids]] — bit-identical to
    * the array_min-over-structs form; the centroid matrix rides as a
    * reference object instead of numCells×dim literals in the plan). */
  private def nearestCell(v: Column, centroids: Array[Seq[Float]]): Column =
    element_at(exprCol(graft.functions.NearestCentroids(
      expression(v), centroids.toIndexedSeq.map(_.toIndexedSeq), 1)), 1)

  /** Append `cell` — each row's nearest Lloyd-trained centroid. The
    * clustering half of [[semanticDuplicates]], public for callers who
    * want the cluster labels themselves (topic bucketing, per-cell
    * stats). Training runs at CALL time (jobs, like fitUnigramModel);
    * the returned frame's assignment pass is one kernel eval per row. */
  def assignCells(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      numCells: Int = 16,
      lloydIters: Int = 2,
      seedIds: Option[Seq[Long]] = None): DataFrame = {
    // silent overwrite of a caller's own `cell` column would feed a wrong
    // blocking key into semanticDuplicates downstream (advisor round-8)
    require(!df.columns.contains("cell"),
      "assignCells writes a 'cell' column but the input already has one — " +
        "rename or drop it first")
    val vecs = vecsFrame(df, idCol, vecCol)
      .persist()
    val centroids = trainCentroids(vecs, numCells, lloydIters, seedIds)
    vecs.unpersist()
    df.withColumn("cell", nearestCell(col(vecCol), centroids))
  }

  /** SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023:
    * cluster the embedding space, then look for near-dups ONLY within a
    * cluster): Lloyd cells as the blocking key for
    * [[embeddingNearDuplicates]]. The quadratic pair work is bounded per
    * cell (and capped/drop-logged via `maxBlockSize`); cross-cell
    * near-dups are the recall trade the technique accepts — raise
    * `numCells` for tighter cells, lower it for higher recall. Returns
    * (id_a, id_b, cosine) with id_a < id_b, cosine ≥ `threshold`. */
  def semanticDuplicates(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numCells: Int = 16,
      lloydIters: Int = 2,
      seedIds: Option[Seq[Long]] = None,
      maxBlockSize: Int = 10000): DataFrame =
    embeddingNearDuplicates(
      assignCells(df, idCol, vecCol, numCells, lloydIters, seedIds),
      idCol, vecCol, "cell", threshold, maxBlockSize)

  def ivfTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCells: Int = 16,
      numProbes: Int = 4,
      lloydIters: Int = 2,
      seedIds: Option[Seq[Long]] = None): DataFrame = {
    val vecs = vecsFrame(candidates, idCol, vecCol)
      .persist()
    val centroids = trainCentroids(vecs, numCells, lloydIters, seedIds)
    vecs.unpersist()
    ivfServe(queries, candidates, idCol, vecCol, k, centroids, numProbes)
  }

  /** Train Lloyd centroids on `candidates` and persist them as a parquet
    * frame `(cell int, centroid array<float>)` at `path` — the
    * [[Retrieval.writeIndex]] analogue for ANN serving: the Lloyd
    * iterations (each a corpus pass) are paid ONCE at build time, and
    * every later query batch goes through [[ivfTopKFromCentroids]]
    * without retraining. The file is KBs (numCells × dim floats). */
  def writeCentroids(
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      numCells: Int = 16,
      lloydIters: Int = 2,
      seedIds: Option[Seq[Long]] = None): Unit = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val vecs = vecsFrame(candidates, idCol, vecCol)
      .persist()
    val centroids = trainCentroids(vecs, numCells, lloydIters, seedIds)
    vecs.unpersist()
    centroids.toIndexedSeq.zipWithIndex
      .map { case (c, i) => (i, c) }
      .toDF("cell", "centroid")
      .coalesce(1) // KBs — one file, no shuffle
      .write.mode("overwrite").parquet(path)
  }

  /** Read a [[writeCentroids]] frame back into the driver-side centroid
    * matrix (KBs — the same driver state training would have produced).
    * Validates the cell ids are the contiguous 0..n-1 the serving kernel
    * indexes by. */
  def loadCentroids(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Seq[Float]] = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("cell").cast("int"), col("centroid"))
      .as[(Int, Seq[Float])].collect().sortBy(_._1)
    require(rows.nonEmpty, s"no centroids at $path")
    require(rows.map(_._1).toSeq == (0 until rows.length),
      s"centroid frame at $path has non-contiguous cell ids " +
        s"${rows.map(_._1).mkString(",")} — expected 0..${rows.length - 1}")
    rows.map(_._2)
  }

  /** IVF top-k over prebuilt centroids ([[writeCentroids]] output):
    * identical results to [[ivfTopK]] with the same centroid matrix,
    * minus the per-call Lloyd training passes — the realistic production
    * pattern for repeated query batches against a stable corpus. */
  def ivfTopKFromCentroids(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroidsPath: String,
      numProbes: Int = 4): DataFrame =
    ivfServe(queries, candidates, idCol, vecCol, k,
      loadCentroids(candidates.sparkSession, centroidsPath), numProbes)

  /** Shared serving path of [[ivfTopK]] / [[ivfTopKFromCentroids]]:
    * assign candidates to their nearest cell, probe each query's
    * `numProbes` nearest cells, score only within probed cells, rank with
    * the bounded heap. */
  private def ivfServe(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Array[Seq[Float]],
      numProbes: Int): DataFrame = {
    val assigned = candidates
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__cell", nearestCell(col("__cv"), centroids))
      .withColumn("__cn", l2Norm(col("__cv")))

    // queries probe their numProbes nearest cells (same kernel, take = P)
    val probeCells: Column =
      exprCol(graft.functions.NearestCentroids(
        expression(col("__qv")), centroids.toIndexedSeq.map(_.toIndexedSeq),
        math.min(numProbes, centroids.length)))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", l2Norm(col("__qv")))
      .withColumn("__cell", explode(probeCells))

    rankTopK(
      q.join(assigned, "__cell")
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cosine",
          cosine(col("__qv"), col("__cv"), col("__qn"), col("__cn"))),
      k)
  }

  // ——— IVF-PQ: product-quantized serving (Jégou et al. 2011) ———

  /** A fitted product quantizer: `codebooks(m)(k)` is subspace m's k-th
    * sub-centroid (M × K × D/M floats — KBs, a driver/reference object
    * like the IVF centroid matrix). */
  final case class PqModel(codebooks: Seq[Seq[Seq[Float]]]) {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "codebooks must be non-empty per subspace")
    val numSubspaces: Int = codebooks.length
    val subDim: Int = codebooks.head.head.length
  }

  private def pqCodesCol(v: Column, model: PqModel): Column =
    exprCol(graft.functions.PqCodes(expression(v),
      model.codebooks.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq))

  /** Train a product quantizer: split the D dims into `m` equal
    * subspaces, k-means each subspace to `kSub` sub-centroids. The
    * per-iteration work is ONE distributed pass: a single [[graft
    * .functions.PqCodes]] eval per row assigns all M subspaces at once,
    * then one `groupBy(subspace, code)` aggregate recomputes every
    * sub-centroid's per-dimension mean through [[treeMeans]] (double
    * accumulate → float cast; deterministic fixed-shape tree, same as
    * [[trainCentroids]]). Seeding is the
    * xxhash64-order sample unless `seedIds` pins explicit rows (the
    * spec/differential hook, as with IVF). Train on a bounded sample at
    * corpus scale — codebook quality saturates quickly and the encode
    * pass is what touches every row. */
  def trainPq(
      candidates: DataFrame, idCol: String, vecCol: String,
      m: Int, kSub: Int, iters: Int = 2,
      seedIds: Option[Seq[Long]] = None): PqModel = {
    require(m >= 1, s"m must be positive, got $m")
    require(kSub >= 1, s"kSub must be positive, got $kSub")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val spark = candidates.sparkSession
    import spark.implicits._
    val vecs = vecsFrame(candidates, idCol, vecCol)
      .persist()
    try {
      val seeds: Array[Seq[Float]] = seedIds match {
        case Some(ids) =>
          val byId = vecs.filter(col("__id").isin(ids: _*))
            .as[(Long, Seq[Float])].collect().toMap
          ids.map(id => byId.getOrElse(id,
            throw new IllegalArgumentException(
              s"seed id $id not present in candidates"))).toArray
        case None => vecs
          .withColumn("__r", xxhash64(col("__id")))
          .orderBy("__r").limit(kSub)
          .select("__v").as[Seq[Float]].collect()
      }
      require(seeds.nonEmpty, "trainPq needs a non-empty candidate set")
      val dim = seeds.head.length
      require(dim % m == 0,
        s"vector dim $dim is not divisible into $m subspaces")
      val dsub = dim / m
      // init: subspace slices of the seed rows (K seeds shared across
      // all M subspaces — one collect, deterministic)
      var codebooks: Array[Array[Seq[Float]]] = Array.tabulate(m) { mi =>
        seeds.map(s => s.slice(mi * dsub, (mi + 1) * dsub)).toArray
      }
      // tree depth from the RAW id frame, once (see trainCentroids)
      val maxId = if (iters > 0)
        vecs.agg(max(col("__id"))).head() match {
          case r if r.isNullAt(0) => 0L
          case r => r.getLong(0)
        }
      else 0L
      (1 to iters).foreach { _ =>
        val model = PqModel(codebooks.map(_.toIndexedSeq).toIndexedSeq)
        // per-(subspace, code) means via the same deterministic tree sum
        // as trainCentroids — bitwise reproducible across engines
        val updated = treeMeans(
          vecs
            .withColumn("__codes", pqCodesCol(col("__v"), model))
            .filter(col("__codes").isNotNull)
            .select(col("__id"), col("__v"),
              posexplode(col("__codes")).as(Seq("__m", "__code")))
            .select(col("__m"), col("__code"), col("__id").as("__tid"),
              slice(col("__v"), col("__m") * dsub + 1, lit(dsub)).as("__tv")),
          Seq("__m", "__code"), dsub, maxIdHint = Some(maxId)).collect()
        updated.foreach { row =>
          codebooks(row.getInt(0))(row.getInt(1)) = row.getSeq[Float](2)
        }
      }
      PqModel(codebooks.map(_.toIndexedSeq).toIndexedSeq)
    } finally vecs.unpersist()
  }

  /** Append `pq_codes` (array<int>, one sub-centroid id per subspace)
    * — map-only. */
  def encodePq(
      df: DataFrame, vecCol: String, model: PqModel,
      outCol: String = "pq_codes"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"encodePq writes '$outCol' but the input already has it — " +
        "rename or drop it first")
    df.withColumn(outCol, pqCodesCol(col(vecCol), model))
  }

  /** IVF-PQ top-k: coarse IVF cells bound WHERE to look, PQ codes bound
    * WHAT crosses the wire. Candidates are encoded map-only to
    * (cell, id, codes, norm) — the 4·D-byte vector never leaves its
    * scan — and grouped into bounded posting rows: each cell is split
    * into ceil(cellCount / maxPerShard) id-hash shards, so a posting row
    * holds ≤ `maxPerShard` entries in expectation even when cells are
    * skewed (the shard count tracks the cell's OWN size, not the global
    * mean; the residual variance is that of a uniform hash over distinct
    * ids). Shard membership never affects results — per-shard pruning is
    * lossless, see below. Each query probes `numProbes`
    * cells and one [[graft.functions.PqAdcTopK]] kernel call scores an
    * entire posting row: the M×K lookup table is built once per
    * (query, shard) and amortized over its candidates; the kernel
    * returns the shard's top k under (cosine desc, id asc) — the SAME
    * total order the global bounded-heap rank applies, so per-shard
    * pruning is lossless w.r.t. the final ranking. Cosines are ADC
    * approximations: quantized dot over the candidate's TRUE stored
    * norm.
    *
    * Training (coarse centroids + codebooks) runs at call time; for
    * repeated batches persist BOTH models ([[writeCentroids]] +
    * [[writePqModel]]) and serve via [[ivfPqTopKFromModels]]. */
  def ivfPqTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCells: Int = 16,
      numProbes: Int = 4,
      m: Int = 8,
      kSub: Int = 16,
      lloydIters: Int = 2,
      pqIters: Int = 2,
      seedIds: Option[Seq[Long]] = None,
      pqSeedIds: Option[Seq[Long]] = None,
      maxPerShard: Int = 4096,
      pqModel: Option[PqModel] = None): DataFrame = {
    require(maxPerShard >= 1, s"maxPerShard must be positive, got $maxPerShard")
    val vecs = vecsFrame(candidates, idCol, vecCol)
      .persist()
    try {
      val centroids = trainCentroids(vecs, numCells, lloydIters, seedIds)
      // at corpus scale: train on a bounded sample and inject via pqModel
      // (the writeCentroids analogue for the quantizer)
      val pq = pqModel.getOrElse(
        trainPq(candidates, idCol, vecCol, m, kSub, pqIters, pqSeedIds))
      ivfPqServe(queries, vecs, idCol, vecCol, k, centroids, pq,
        numProbes, maxPerShard)
    } finally vecs.unpersist()
  }

  /** [[ivfPqTopK]] from PERSISTED models ([[writeCentroids]] +
    * [[writePqModel]] output): identical results to [[ivfPqTopK]] with
    * the same centroid matrix and codebooks, minus every training pass —
    * the production serving path for repeated query batches against a
    * stable corpus (the [[ivfTopKFromCentroids]] pattern, extended to
    * the quantizer). Each call still encodes the candidate frame
    * map-only and builds the bounded posting rows; persist/serve the
    * posting frame itself when even that should be amortized. */
  def ivfPqTopKFromModels(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroidsPath: String,
      pqModelPath: String,
      numProbes: Int = 4,
      maxPerShard: Int = 4096): DataFrame = {
    require(maxPerShard >= 1, s"maxPerShard must be positive, got $maxPerShard")
    val spark = candidates.sparkSession
    val vecs = vecsFrame(candidates, idCol, vecCol)
    ivfPqServe(queries, vecs, idCol, vecCol, k,
      loadCentroids(spark, centroidsPath).toArray,
      readPqModel(spark, pqModelPath), numProbes, maxPerShard)
  }

  /** Shared serving core of [[ivfPqTopK]] / [[ivfPqTopKFromModels]]:
    * encode candidates map-only to (cell, id, codes, norm), build the
    * per-cell id-hash-sharded posting rows, probe + ADC-score + rank.
    * `vecs` is the (__id, __v)-shaped candidate frame (persisted by the
    * training caller; serving needs no persist — each branch below scans
    * it once per job the same way any declarative frame is). */
  private def ivfPqServe(
      queries: DataFrame,
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Array[Seq[Float]],
      pq: PqModel,
      numProbes: Int,
      maxPerShard: Int): DataFrame = {
    {
      // encode: the only candidate-side exchange carries (id, M ints,
      // norm) — never the vector. Shard counts are PER CELL
      // (ceil(cellCount / maxPerShard)) so a skewed hot cell still honors
      // the posting-row cap in expectation over the id hash — a single
      // global shard count derived from the mean cell size does not (the
      // hot cell's rows would all land in too few shards). The per-cell
      // count aggregation replaces the global count() the old form
      // needed anyway: same job count, ≤numCells rows on the driver.
      // NearestCentroids yields NULL for null/dim-mismatched vectors; such
      // rows can never be probed, so drop them up front — otherwise the
      // null-key group row NPEs the r.getInt(0) in the cellCounts collect.
      val encoded = vecs
        .withColumn("__cell", nearestCell(col("__v"), centroids))
        .filter(col("__cell").isNotNull)
      val cellCounts: Map[Int, Long] = encoded
        .groupBy(col("__cell")).agg(count(lit(1)).as("__cn"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val shardByCell: Column = element_at(
        map(cellCounts.toSeq.sortBy(_._1).flatMap { case (c, n) =>
          Seq(lit(c), lit((n + maxPerShard - 1) / maxPerShard))
        }: _*),
        col("__cell"))
      val posting = encoded
        .withColumn("__codes", pqCodesCol(col("__v"), pq))
        .withColumn("__n", l2Norm(col("__v")))
        .withColumn("__shard", pmod(xxhash64(col("__id")), shardByCell))
        .groupBy(col("__cell"), col("__shard"))
        .agg(collect_list(struct(
          col("__id").as("id"), col("__codes").as("codes"),
          col("__n").as("norm"))).as("__entries"))

      val probeCells: Column =
        exprCol(graft.functions.NearestCentroids(
          expression(col("__qv")),
          centroids.toIndexedSeq.map(_.toIndexedSeq),
          math.min(numProbes, centroids.length)))
      val q = queries
        .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
        .withColumn("__qn", l2Norm(col("__qv")))
        .withColumn("__cell", explode(probeCells))

      val shardTopK = exprCol(graft.functions.PqAdcTopK(
        expression(col("query_id")), expression(col("__qv")),
        expression(col("__qn")), expression(col("__entries")),
        pq.codebooks.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq, k))
      // posting is numCells×nShards rows — broadcast-sized by
      // construction at serving time (entries are code-compressed)
      val scored = q.join(posting.hint("shuffle_hash"), "__cell")
        .withColumn("__topk", shardTopK)
        .select(col("query_id"), explode(col("__topk")).as("__e"))
        .select(col("query_id"), col("__e.neighbor_id").as("neighbor_id"),
          col("__e.cosine").as("cosine"))
      rankTopK(scored, k)
    }
  }

  /** Persist a fitted product quantizer as a (subspace, code, centroid)
    * parquet table — the [[writeCentroids]] analogue for the quantizer:
    * train once (on a bounded sample at corpus scale), serve every query
    * batch via [[ivfPqTopKFromModels]]. */
  def writePqModel(spark: SparkSession, m: PqModel, path: String): Unit = {
    import spark.implicits._
    m.codebooks.zipWithIndex.flatMap { case (cb, mi) =>
      cb.zipWithIndex.map { case (c, code) => (mi, code, c) }
    }.toDF("subspace", "code", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a [[writePqModel]] table back into an encode-ready [[PqModel]],
    * validating that subspaces and codes are contiguous from 0 (a partial
    * or hand-edited table would otherwise silently mis-assign codes). */
  def readPqModel(spark: SparkSession, path: String): PqModel = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("subspace").cast("int"), col("code").cast("int"),
        col("centroid"))
      .as[(Int, Int, Seq[Float])].collect()
    require(rows.nonEmpty, s"no PQ codebooks at $path")
    val byM = rows.groupBy(_._1)
    require(byM.keySet == (0 until byM.size).toSet,
      s"PQ table at $path has non-contiguous subspaces " +
        s"${byM.keys.toSeq.sorted.mkString(",")}")
    PqModel((0 until byM.size).map { mi =>
      val cs = byM(mi).sortBy(_._2)
      require(cs.map(_._2).toSeq == (0 until cs.length),
        s"PQ table at $path, subspace $mi: non-contiguous codes " +
          s"${cs.map(_._2).mkString(",")}")
      cs.map(_._3.toIndexedSeq).toIndexedSeq
    })
  }

  /** Embedding-cosine near-duplicate pairs within a blocking key (e.g. a
    * cluster label or LSH bucket): pairs with cosine ≥ `threshold`.
    * The blocking column bounds the pair blow-up; at corpus scale feed the
    * output of `hyperplaneSignature` as the block.
    *
    * The within-block self-join is quadratic in the block, so blocks over
    * `maxBlockSize` members are SKIPPED whole (same machinery and rationale
    * as the LSH bucket caps, [[Dedup.capBuckets]]): a degenerate block — a
    * default/zero embedding shared by millions of rows, a catch-all LSH
    * bucket — would otherwise recreate exactly the pair flood the blocking
    * exists to prevent. Drops are logged via [[DropMetrics]]; an over-cap
    * block is a mass-near-duplicate group whose members belong in
    * exact/cluster dedup, not in pair enumeration.
    */
  def embeddingNearDuplicates(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      threshold: Double,
      maxBlockSize: Int = 10000): DataFrame = {
    require(maxBlockSize > 0, s"maxBlockSize must be positive, got $maxBlockSize")
    val keyed = df.select(col(blockCol).as("__blk"), col(idCol), col(vecCol))
    // the cap rides the SAME clustering the pair join needs: a count()
    // window partitioned by the block key shuffles the corpus on __blk
    // exactly once — the very exchange the self-join would perform — then
    // over-cap blocks are filtered before any pairing. No second corpus
    // shuffle, no separate count job; a degenerate 10⁶-row block costs the
    // window a single count, not 10¹² pairs. Drop totals ride the plan
    // via observe (zero extra jobs).
    val wBlk = Window.partitionBy(col("__blk"))
    val counted = DropMetrics.observe(
      keyed.withColumn("__block_n", count(lit(1)).over(wBlk)),
      "embedding_block", Seq(
        sum(when(col("__block_n") > maxBlockSize, lit(1L)).otherwise(lit(0L)))
          .as("dropped_rows"),
        max(col("__block_n")).as("max_block_size"),
        lit(maxBlockSize.toLong).as("cap")))
    val withNorm = counted
      .filter(col("__block_n") <= maxBlockSize)
      .drop("__block_n")
      .withColumn("__n", l2Norm(col(vecCol)))
    val a = withNorm.select(col("__blk"), col(idCol).as("id_a"),
      col(vecCol).as("__va"), col("__n").as("__na"))
    val b = withNorm.select(col("__blk"), col(idCol).as("id_b"),
      col(vecCol).as("__vb"), col("__n").as("__nb"))
    // shuffle_hash: under the cap's filter Catalyst's size estimate
    // collapses and it would otherwise broadcast a corpus-sized side
    a.hint("shuffle_hash").join(b.hint("shuffle_hash"), "__blk")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("__va"), col("__vb"), col("__na"), col("__nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Per-group embedding centroids + drift vs the corpus centroid: for
    * each group (source / language / shard / day), the mean vector's
    * cosine to the GLOBAL mean vector — the distribution-shift audit for
    * embedding-bearing corpora (a source whose centroid points away from
    * the corpus is the first thing to inspect before mixing, and a day
    * whose drift drops is an embedding-model or crawl regression).
    *
    * Plan: ONE corpus pass — posexplode the vectors and aggregate
    * (group, dim) → (sum, count); everything downstream (group means,
    * the global mean as the dim-wise sum of group sums, the cosine
    * reduction) runs on the |groups|·dim aggregate frame, KB-scale at
    * any corpus size. The vectors never shuffle: only per-dim partial
    * sums cross the exchange. Output (groupCol, n, cos_to_global),
    * cosine rounded (double summation order is engine/partition-
    * dependent; rounding absorbs it, the repo-wide oracle rule).
    *
    * Zero-norm edge: a group (or corpus) whose mean is the zero vector
    * has no direction — its cosine is null, never NaN.
    */
  def centroidDrift(
      df: DataFrame,
      vecCol: String,
      groupCol: String,
      roundTo: Int = 6): DataFrame =
    driftFromPartials(centroidPartials(df, vecCol, groupCol), groupCol, roundTo)

  /** The (group, dim) → (sum, count) partial-sum frame behind
    * [[centroidDrift]] — the ONLY corpus-scale stage, and a MERGEABLE
    * sufficient statistic: partials from two corpus slices sum to the
    * partials of their union, which is what makes the incremental path
    * ([[writeCentroidState]]/[[centroidDriftFromStates]]) exact. */
  private def centroidPartials(
      df: DataFrame, vecCol: String, groupCol: String): DataFrame =
    df.select(col(groupCol).as("__grp"),
        posexplode(col(vecCol)).as(Seq("__pos", "__v")))
      .groupBy(col("__grp"), col("__pos"))
      .agg(sum(col("__v").cast("double")).as("__s"), count(lit(1)).as("__c"))

  private def driftFromPartials(
      gp: DataFrame, groupCol: String, roundTo: Int): DataFrame = {
    // tiny from here on: |groups| × dim rows
    val glob = gp.groupBy(col("__pos"))
      .agg((sum(col("__s")) / sum(col("__c"))).as("__gm"))
    val joined = gp
      .withColumn("__m", col("__s") / col("__c"))
      .join(broadcast(glob), Seq("__pos"))
    joined
      .groupBy(col("__grp"))
      .agg(
        max(col("__c")).as("n"),
        sum(col("__m") * col("__gm")).as("__dot"),
        sum(col("__m") * col("__m")).as("__mm"),
        sum(col("__gm") * col("__gm")).as("__gg"))
      .select(col("__grp").as(groupCol), col("n"),
        round(when(col("__mm") > 0 && col("__gg") > 0,
            col("__dot") / (sqrt(col("__mm")) * sqrt(col("__gg")))),
          roundTo).as("cos_to_global"))
  }

  /** Persist [[centroidDrift]]'s per-(group, dim) partial sums for a
    * corpus slice (one day's increment, one shard): (group, pos, s, c)
    * parquet — KB-scale whatever the slice size. Day-N drift then reads
    * N state files and never re-scans any day's vectors. */
  def writeCentroidState(
      df: DataFrame, vecCol: String, groupCol: String, path: String): Unit =
    centroidPartials(df, vecCol, groupCol)
      .select(col("__grp").as(groupCol), col("__pos").as("pos"),
        col("__s").as("s"), col("__c").as("c"))
      .write.mode("overwrite").parquet(path)

  /** Drift over the UNION of persisted centroid states — exact, because
    * the partials are mergeable sufficient statistics: summing per-slice
    * (s, c) reproduces the whole-corpus partials bit-for-bit up to
    * double-add order (absorbed by the rounding contract). The
    * incremental audit path: day-2 cost = day-2's own partials + a
    * KB-scale merge, never a historical re-scan. */
  def centroidDriftFromStates(
      spark: SparkSession,
      paths: Seq[String],
      groupCol: String,
      roundTo: Int = 6): DataFrame = {
    require(paths.nonEmpty, "need at least one centroid state path")
    val merged = paths.map(spark.read.parquet(_)).reduce(_ unionByName _)
      .groupBy(col(groupCol).as("__grp"), col("pos").as("__pos"))
      .agg(sum(col("s")).as("__s"), sum(col("c")).as("__c"))
    driftFromPartials(merged, groupCol, roundTo)
  }
}
