package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines (north-star
  * extension). Media payloads are opaque `binary` columns with typed
  * metadata; decode / feature-extraction run per-partition in batches so a
  * real codec (image/audio libs are absent in this container) can be
  * dropped in without touching the Spark-side plumbing.
  *
  * The decode step itself is a clearly-marked deterministic STUB
  * (`stubDecode`): it derives pseudo-features from the raw bytes so the
  * schema, partitioning, batch shape and tests are all real.
  */
object Multimodal {

  /** One media item: payload + typed metadata. */
  final case class MediaItem(
      media_id: Long,
      payload: Array[Byte],
      format: String,
      source: String)

  /** Decoded features (what a real image/audio decoder would emit). */
  final case class MediaFeatures(
      media_id: Long,
      byte_len: Int,
      first_cp: Int,
      checksum: Long,
      width: Int,
      height: Int)

  /** STUB decoder — stands in for an image/audio codec. Deterministic pure
    * function of the payload bytes: byte length, first byte, a rolling
    * checksum, and fake dimensions derived from the length. Replace the
    * body with a real codec (e.g. TwelveMonkeys/JCodec) when available;
    * the signature is the contract.
    */
  def stubDecode(item: MediaItem): MediaFeatures = {
    val bytes = item.payload
    // first Unicode code point of the UTF-8 payload (0 when empty) — a
    // cross-engine-checkable stand-in for "decoded header field"
    val first =
      if (bytes.isEmpty) 0
      else new String(bytes, java.nio.charset.StandardCharsets.UTF_8).codePointAt(0)
    var cs = 0L
    var i = 0
    while (i < bytes.length) { // batch-friendly tight loop, no boxing
      cs = (cs * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    MediaFeatures(
      media_id = item.media_id,
      byte_len = bytes.length,
      first_cp = first,
      checksum = cs,
      width = bytes.length % 640 + 16,
      height = (bytes.length / 640) % 480 + 16)
  }

  /** Decode a media Dataset partition-wise. `mapPartitions` keeps the codec
    * initialization (a real decoder's native context) once per partition
    * and streams items through it — the Scala analogue of `mapInPandas`
    * batch plumbing.
    */
  def decode(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // real codec would be initialized here, once per partition
      it.map(stubDecode)
    }
  }

  /** Frame-sampling plumbing: pick every `stride`-th chunk of `chunkLen`
    * bytes as a pseudo-frame (a video decoder would seek keyframes). Shows
    * the explode-to-frames shape: one row per sampled frame.
    */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      chunkLen: Int,
      stride: Int): DataFrame =
    df.select(
        col(idCol),
        posexplode(
          transform(
            sequence(lit(0),
              greatest((octet_length(col(payloadCol)) / (chunkLen * stride))
                .cast("int") - 1, lit(0))),
            i => substring(col(payloadCol), (i * chunkLen * stride + 1).cast("int"), lit(chunkLen))))
          .as(Seq("frame_idx", "frame_bytes")))

  /** Container-format sniffing from magic bytes — REAL logic (not a stub):
    * classifies a binary payload by its leading signature without decoding.
    * Pure column expressions (hex prefix compare), so it codegens and
    * pushes through scans; the cheap pre-filter before any expensive
    * decode fan-out ("route PNGs to the image pool, WAVs to audio").
    */
  def sniffFormat(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val p8 = hex(substring(payload, 1, 8))
    // RIFF is a container: the subtype tag at bytes 9-12 distinguishes
    // WAVE audio from WEBP images and AVI video
    val riffTag = hex(substring(payload, 9, 4))
    when(p8.startsWith("89504E47"), "image/png")
      .when(p8.startsWith("FFD8FF"), "image/jpeg")
      .when(p8.startsWith("474946383"), "image/gif")
      .when(p8.startsWith("52494646") && riffTag === "57415645", "audio/wav")
      .when(p8.startsWith("52494646") && riffTag === "57454250", "image/webp")
      .when(p8.startsWith("52494646") && riffTag === "41564920", "video/avi")
      .when(p8.startsWith("1A45DFA3"), "video/webm") // EBML/Matroska
      .when(p8.startsWith("25504446"), "application/pdf")
      .otherwise("application/octet-stream")
  }

  /** Batched resize plumbing: groups a partition's items into fixed-size
    * batches before invoking the (stub) kernel — the shape a real
    * vectorized/GPU codec needs (one native call per batch, not per item).
    * The stub records the batch size each item was processed with, so the
    * batching behavior itself is testable; a real resize drops into
    * `resizeKernel` without touching the Spark plumbing.
    */
  final case class ResizedMedia(
      media_id: Long,
      width: Int,
      height: Int,
      batch_size: Int)

  def resizeBatch(
      items: Dataset[MediaItem],
      targetW: Int,
      targetH: Int,
      batchSize: Int = 32): Dataset[ResizedMedia] = {
    import items.sparkSession.implicits._
    def resizeKernel(batch: Seq[MediaItem]): Seq[ResizedMedia] =
      // real codec: one vectorized call over the whole batch here
      batch.map(i => ResizedMedia(i.media_id, targetW, targetH, batch.size))
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap(g => resizeKernel(g.toSeq))
    }
  }

  /** Media → embedding seam: a deterministic pseudo-embedding from the
    * payload bytes (stride-sampled, hashed per dimension, L2-normalized in
    * the kernel's float math). Stands in for a real vision/audio encoder;
    * downstream ANN dedup (`ext.Similarity`) composes unchanged.
    */
  final case class MediaEmbedding(media_id: Long, embedding: Seq[Float])

  def stubEmbed(items: Dataset[MediaItem], dim: Int = 16): Dataset[MediaEmbedding] = {
    import items.sparkSession.implicits._
    items.map { item =>
      val raw = new Array[Float](dim)
      val bytes = item.payload
      var i = 0
      while (i < bytes.length) {
        raw(i % dim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      val norm = math.sqrt(raw.map(x => x.toDouble * x).sum)
      val out =
        if (norm == 0.0) raw.toSeq
        else raw.map(x => (x / norm).toFloat).toSeq
      MediaEmbedding(item.media_id, out)
    }
  }

  /** Arrow-batch codec seam — the columnar twin of the row-batched
    * [[decode]]/[[resizeBatch]] plumbing (the machinery PySpark's
    * `mapInArrow` uses, reached through
    * [[org.apache.spark.sql.GraftArrowBridge]]): the media table leaves
    * Spark as serialized Arrow IPC record batches, an external worker
    * (pyarrow / native codec — absent in this container, so the seam is
    * the identity by default) transforms batch-by-batch, and the result
    * re-enters as a DataFrame with zero per-row serialization on either
    * side. `batchTransform` receives and returns Arrow IPC bytes;
    * `outSchema` declares the worker's output schema (defaults to the
    * input schema for in-place feature rewrites).
    */
  def transformViaArrow(
      df: DataFrame,
      batchTransform: Array[Byte] => Array[Byte] = identity,
      outSchema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    import org.apache.spark.sql.GraftArrowBridge
    // self-contained chunks (schema preamble + batch): the worker reads
    // each with a bare pyarrow.ipc.open_stream and answers in kind — no
    // out-of-band schema transport in either direction
    val out = GraftArrowBridge.toSelfContainedBatchRdd(df).map(batchTransform)
    GraftArrowBridge.fromSelfContainedBatchRdd(df.sparkSession, out,
      outSchema.getOrElse(df.schema))
  }

  /** Executor-side subprocess pump for [[transformViaArrow]]: pipe one
    * Arrow IPC batch through `cmd`'s stdin/stdout (one stateless worker
    * process per batch — the shape a pooled GPU encoder sits behind; a
    * long-lived pool drops in here without touching the Spark side).
    * Fails loudly with the worker's stderr on a non-zero exit.
    *
    * stdin and stderr are pumped on their own threads while this thread
    * reads stdout, so a chatty worker (a long traceback, GPU/torch
    * logging past the ~64KB OS pipe buffer) can never deadlock the task:
    * all three pipes always have a dedicated reader/writer. Captured
    * stderr is capped at `maxStderrBytes` (the pipe keeps draining past
    * the cap — only capture stops). `timeout` bounds the WHOLE call via a
    * watchdog that force-kills the process at the deadline — a worker
    * that wedges before producing output (CUDA init deadlock), stalls
    * mid-stream, or closes stdout and never exits all unblock the task
    * the same way: the kill closes the pipes, the read loops see EOF,
    * and the call throws. The drainer join is short-bounded so a
    * grandchild holding the stderr write end open (an inherited logging
    * daemon) cannot stall a successful batch. */
  def pipeThroughWorker(
      cmd: Seq[String],
      timeout: java.time.Duration = java.time.Duration.ofMinutes(10),
      maxStderrBytes: Int = 1 << 20): Array[Byte] => Array[Byte] =
    (batch: Array[Byte]) => {
      val pb = new ProcessBuilder(cmd: _*)
      val proc = pb.start()
      val out = new java.io.ByteArrayOutputStream()
      val err = new java.io.ByteArrayOutputStream()
      @volatile var timedOut = false
      val killer = new Thread(() => {
        try {
          if (!proc.waitFor(timeout.toMillis,
              java.util.concurrent.TimeUnit.MILLISECONDS)) {
            timedOut = true
            proc.destroyForcibly()
          }
        } catch { case _: InterruptedException => () } // normal completion
      })
      killer.setDaemon(true)
      killer.start()
      val writer = new Thread(() => {
        try { proc.getOutputStream.write(batch); proc.getOutputStream.close() }
        catch { case _: java.io.IOException => () } // worker died first
      })
      writer.setDaemon(true)
      writer.start()
      @volatile var errTruncated = false
      val errDrainer = new Thread(() => {
        val ebuf = new Array[Byte](64 * 1024)
        try {
          var n = proc.getErrorStream.read(ebuf)
          while (n >= 0) {
            err.synchronized {
              val keep = math.min(n, maxStderrBytes - err.size)
              if (keep > 0) err.write(ebuf, 0, keep)
              if (keep < n) errTruncated = true
            }
            n = proc.getErrorStream.read(ebuf)
          }
        } catch { case _: java.io.IOException => () }
      })
      errDrainer.setDaemon(true)
      errDrainer.start()
      val buf = new Array[Byte](64 * 1024)
      var n = proc.getInputStream.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = proc.getInputStream.read(buf) }
      val rc = proc.waitFor() // bounded: the killer fires at the deadline
      killer.interrupt()
      writer.join(1000)
      errDrainer.join(1000) // short: don't stall on a grandchild's pipe
      if (timedOut)
        throw new IllegalStateException(
          s"worker ${cmd.mkString(" ")} did not exit within ${timeout.getSeconds}s (killed)")
      val errText = err.synchronized {
        err.toString("UTF-8") + (if (errTruncated) " …[stderr truncated]" else "")
      }
      require(rc == 0,
        s"worker ${cmd.mkString(" ")} exited $rc: $errText")
      out.toByteArray
    }

  /** Media → embedding through an EXTERNAL Arrow worker
    * ([[transformViaArrow]] ∘ [[pipeThroughWorker]]): the media frame
    * leaves Spark as Arrow IPC batches, the worker (default:
    * `scripts/embed_worker.py`, a numpy process replicating
    * [[stubEmbed]]'s float math bit-for-bit — swap in a real encoder
    * there) returns (media_id, embedding float32[dim]) batches, and the
    * result re-enters as a DataFrame ANN composes on unchanged
    * ([[Similarity.ivfPqTopK]] etc.). Zero per-row serialization on the
    * JVM side; one worker process per batch. */
  def embedViaWorker(
      media: DataFrame,
      cmd: Seq[String],
      dim: Int = 16): DataFrame = {
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    transformViaArrow(
      media.select(col("media_id"), col("payload")),
      pipeThroughWorker(cmd), Some(outSchema))
  }

  /** Build a media table from any table with a string column, for tests and
    * the oracle query: payload = UTF-8 bytes of the text. */
  def mediaFromText(
      df: DataFrame,
      idCol: String,
      textCol: String,
      source: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      lit("text/plain").as("format"),
      lit(source).as("source"))
}
