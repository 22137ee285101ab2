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
    when(p8.startsWith("424D"), "image/bmp")
      .when(p8.startsWith("89504E47"), "image/png")
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

  // ——— REAL codecs: BMP (24bpp uncompressed) + WAV (PCM16) ———
  // Both formats are header + raw samples, so a complete, correct decoder
  // needs no external library — this is the promised "real codec behind
  // the batch seam", not a stub: BGR→RGB conversion, bottom-up row flip,
  // 4-byte row padding, RIFF chunk walking and PCM16 extraction are all
  // the genuine format semantics. Anything else (PNG/JPEG — entropy-coded,
  // codec libs absent in this container) still routes to the disclosed
  // byte-stats fallback.

  /** Decoded real-media features — integer-exact accumulation everywhere
    * (byte sums / sample square-sums in Long), so the external numpy
    * worker reproduces `mean_value` BIT-for-bit: both engines divide the
    * same exact integer by the same count and round the same IEEE double.
    * BMP: width×height, channels=3, n_samples=pixel count, mean_value =
    * mean pixel-byte (0–255). WAV: channels/sample_rate from fmt,
    * n_samples=frames per channel, mean_value = RMS of normalized samples.
    * Other payloads: format `application/octet-stream`, n_samples=byte
    * length, mean_value = mean byte. */
  final case class RealMediaFeatures(
      media_id: Long,
      format: String,
      width: Int,
      height: Int,
      channels: Int,
      sample_rate: Int,
      n_samples: Long,
      mean_value: Double)

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    u16(b, off).toLong | (u16(b, off + 2).toLong << 16)
  private def i32(b: Array[Byte], off: Int): Int = u32(b, off).toInt

  /** Full BMP pixel decode: (width, height, top-down RGB bytes).
    * Supports the ubiquitous BITMAPINFOHEADER 24bpp uncompressed
    * bottom-up form; anything else fails loudly (a silent wrong decode
    * poisons every downstream feature). Handles the two REAL format
    * quirks a naive reader gets wrong: rows are stored bottom-up and
    * padded to 4 bytes, and pixels are BGR, not RGB. */
  def bmpPixels(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(b.length >= 54 && b(0) == 'B' && b(1) == 'M',
      s"not a BMP payload (${b.length} bytes)")
    val dataOff = u32(b, 10).toInt
    val hdrSize = u32(b, 14)
    require(hdrSize >= 40, s"unsupported BMP core-header size $hdrSize")
    val w = i32(b, 18)
    val h = i32(b, 22)
    require(w > 0 && h > 0, s"unsupported BMP dimensions ${w}x$h " +
      "(top-down negative-height BMPs not supported)")
    val planes = u16(b, 26); val bpp = u16(b, 28); val comp = u32(b, 30)
    require(planes == 1 && bpp == 24 && comp == 0,
      s"unsupported BMP variant: planes=$planes bpp=$bpp compression=$comp " +
        "(only 24bpp uncompressed)")
    val rowBytes = w * 3
    val rowStride = (rowBytes + 3) & ~3
    require(b.length.toLong >= dataOff.toLong + rowStride.toLong * (h - 1) + rowBytes,
      s"truncated BMP: ${b.length} bytes < pixel data for ${w}x$h")
    val out = new Array[Byte](w * h * 3)
    var r = 0
    while (r < h) {
      val srcBase = dataOff + (h - 1 - r) * rowStride // bottom-up storage
      var x = 0
      while (x < w) {
        val s = srcBase + x * 3
        val d = (r * w + x) * 3
        out(d) = b(s + 2) // B,G,R on disk -> R,G,B out
        out(d + 1) = b(s + 1)
        out(d + 2) = b(s)
        x += 1
      }
      r += 1
    }
    (w, h, out)
  }

  /** Full WAV decode: (channels, sampleRate, interleaved PCM16 samples).
    * Walks RIFF chunks properly (fmt may be followed by LIST/fact before
    * data; chunk sizes pad to even) — PCM16 only, loud failure otherwise. */
  def wavSamples(b: Array[Byte]): (Int, Int, Array[Short]) = {
    require(b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F'
        && b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V'
        && b(11) == 'E',
      s"not a RIFF/WAVE payload (${b.length} bytes)")
    // chunk offsets/lengths in Long: a malformed 32-bit length near
    // 2^32 would Int-truncate NEGATIVE and stall the walk (off += 0) —
    // an adversarial document must error, never wedge an executor task
    var off = 12L
    var channels = -1; var sampleRate = -1
    var dataOff = -1L; var dataLen = -1L
    while (off + 8 <= b.length && (channels < 0 || dataOff < 0)) {
      val cid = new String(b, off.toInt, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val clen = u32(b, off.toInt + 4) // unsigned, 0..2^32-1
      if (cid == "fmt ") {
        require(clen >= 16 && off + 8 + 16 <= b.length, "truncated fmt chunk")
        val audioFormat = u16(b, off.toInt + 8)
        channels = u16(b, off.toInt + 10)
        sampleRate = u32(b, off.toInt + 12).toInt
        val bits = u16(b, off.toInt + 22)
        require(audioFormat == 1 && bits == 16,
          s"unsupported WAV variant: format=$audioFormat bits=$bits " +
            "(only PCM16)")
      } else if (cid == "data") {
        dataOff = off + 8; dataLen = clen
      }
      off += 8 + clen + (clen & 1) // RIFF chunks pad to even length
    }
    require(channels > 0 && sampleRate > 0, "WAV has no fmt chunk")
    require(dataOff >= 0, "WAV has no data chunk")
    require(dataOff + dataLen <= b.length,
      s"truncated WAV: data chunk claims $dataLen bytes past payload end")
    val dataOffI = dataOff.toInt
    val n = (dataLen / 2).toInt
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = ((b(dataOffI + 2 * i) & 0xff)
        | ((b(dataOffI + 2 * i + 1) & 0xff) << 8)).toShort
      i += 1
    }
    (channels, sampleRate, out)
  }

  /** Dispatch on magic bytes: real BMP/WAV decode, byte-stats fallback
    * for everything else. Pure function — safe inside `mapPartitions`. */
  def decodeReal(item: MediaItem): RealMediaFeatures = {
    // null payload = empty octet-stream row, matching the numpy worker's
    // explicit None handling (a crash here would break the bit-for-bit
    // twin contract on exactly the input the worker tolerates)
    val b = if (item.payload == null) Array.emptyByteArray else item.payload
    if (b.length >= 54 && b(0) == 'B' && b(1) == 'M') {
      val (w, h, px) = bmpPixels(b)
      var sum = 0L; var i = 0
      while (i < px.length) { sum += (px(i) & 0xff); i += 1 }
      RealMediaFeatures(item.media_id, "image/bmp", w, h, 3, 0,
        w.toLong * h, sum.toDouble / px.length)
    } else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F'
        && b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V'
        && b(11) == 'E') {
      val (ch, sr, samples) = wavSamples(b)
      var sq = 0L; var i = 0
      while (i < samples.length) {
        sq += samples(i).toLong * samples(i); i += 1
      }
      val rms =
        if (samples.isEmpty) 0.0
        else math.sqrt(sq.toDouble / samples.length) / 32768.0
      RealMediaFeatures(item.media_id, "audio/wav", 0, 0, ch, sr,
        samples.length.toLong / math.max(ch, 1), rms)
    } else {
      var sum = 0L; var i = 0
      while (i < b.length) { sum += (b(i) & 0xff); i += 1 }
      RealMediaFeatures(item.media_id, "application/octet-stream", 0, 0, 0, 0,
        b.length.toLong, if (b.isEmpty) 0.0 else sum.toDouble / b.length)
    }
  }

  /** [[decodeReal]] over a media Dataset, partition-wise — the same batch
    * path as the stub [[decode]], now with a real codec in the body. */
  def decodeRealMedia(items: Dataset[MediaItem]): Dataset[RealMediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map(decodeReal))
  }

  /** External twin of [[decodeRealMedia]] over the Arrow IPC seam: the
    * pure-numpy worker (`scripts/media_worker.py`) decodes the same BMP/
    * WAV formats from the raw bytes and must agree BIT-for-bit
    * (MultimodalSpec) — the proof that a real out-of-process codec drops
    * into [[transformViaArrow]] without touching the Spark side. */
  def decodeViaWorker(media: DataFrame, cmd: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", LongType),
      StructField("mean_value", DoubleType)))
    transformViaArrow(
      media.select(col("media_id"), col("payload")),
      pipeThroughWorker(cmd), Some(outSchema))
  }

  // ——— real-format ENCODERS (the fixtures' and oracle query's source) ———

  // little-endian writers shared by both encoders (the mirror of the
  // decoders' u16/u32 readers)
  private def put16(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def put32(out: Array[Byte], off: Int, v: Long): Unit = {
    put16(out, off, (v & 0xffff).toInt)
    put16(out, off + 2, ((v >> 16) & 0xffff).toInt)
  }

  /** Encode top-down RGB bytes as a 24bpp uncompressed BMP — the exact
    * inverse of [[bmpPixels]] (row flip, RGB→BGR, 4-byte padding). */
  def buildBmp(w: Int, h: Int, rgbTopDown: Array[Byte]): Array[Byte] = {
    require(rgbTopDown.length == w * h * 3,
      s"need ${w * h * 3} RGB bytes, got ${rgbTopDown.length}")
    val rowBytes = w * 3
    val rowStride = (rowBytes + 3) & ~3
    val dataSize = rowStride * h
    val out = new Array[Byte](54 + dataSize)
    def put16(off: Int, v: Int): Unit = Multimodal.put16(out, off, v)
    def put32(off: Int, v: Long): Unit = Multimodal.put32(out, off, v)
    out(0) = 'B'; out(1) = 'M'
    put32(2, out.length.toLong); put32(10, 54L)
    put32(14, 40L); put32(18, w.toLong); put32(22, h.toLong)
    put16(26, 1); put16(28, 24); put32(30, 0L); put32(34, dataSize.toLong)
    var r = 0
    while (r < h) {
      val dstBase = 54 + (h - 1 - r) * rowStride
      var x = 0
      while (x < w) {
        val s = (r * w + x) * 3
        val d = dstBase + x * 3
        out(d) = rgbTopDown(s + 2); out(d + 1) = rgbTopDown(s + 1)
        out(d + 2) = rgbTopDown(s)
        x += 1
      }
      r += 1
    }
    out
  }

  /** Encode interleaved PCM16 samples as a canonical WAV. */
  def buildWav(channels: Int, sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def put16(off: Int, v: Int): Unit = Multimodal.put16(out, off, v)
    def put32(off: Int, v: Long): Unit = Multimodal.put32(out, off, v)
    def putTag(off: Int, s: String): Unit =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        .zipWithIndex.foreach { case (c, i) => out(off + i) = c }
    putTag(0, "RIFF"); put32(4, 36L + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16L); put16(20, 1); put16(22, channels)
    put32(24, sampleRate.toLong)
    put32(28, sampleRate.toLong * channels * 2) // byte rate
    put16(32, channels * 2); put16(34, 16)      // block align, bits
    putTag(36, "data"); put32(40, dataLen.toLong)
    var i = 0
    while (i < samples.length) {
      put16(44 + 2 * i, samples(i) & 0xffff); i += 1
    }
    out
  }

  /** Deterministic synthetic WAV from (id, nChars) — modular-arithmetic
    * samples so the DuckDB oracle computes the DECODED features in closed
    * form without ever seeing the bytes (`mm_features_real`). */
  def synthWav(id: Long, nChars: Long): Array[Byte] = {
    val n = (nChars % 50 + 10).toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = ((id * 31 + i * 7) % 65536 - 32768).toShort
      i += 1
    }
    buildWav(1, 8000, samples)
  }

  /** Deterministic synthetic BMP from (id, nChars) — same closed-form
    * contract as [[synthWav]] (byte mean is permutation-invariant, so the
    * encoder's BGR flip + row order never reaches the oracle). */
  def synthBmp(id: Long, nChars: Long): Array[Byte] = {
    val w = (nChars % 30 + 1).toInt
    val h = 3
    val px = new Array[Byte](w * h * 3)
    var j = 0
    while (j < px.length) {
      px(j) = ((id * 7 + j * 13) % 256).toByte; j += 1
    }
    buildBmp(w, h, px)
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
