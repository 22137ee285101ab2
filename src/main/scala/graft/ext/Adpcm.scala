package graft.ext

/** IMA/DVI ADPCM (4-bit) — the compressed-speech WAV variant
  * (`wFormatTag = 0x11`), the next real audio corpus format after
  * G.711: 4 bits/sample against 16-bit PCM, block-structured so the
  * stream is seekable. Built from the published IMA algorithm (the
  * step-size and index-adaptation tables are spec constants, identical
  * to CPython's independent `audioop` implementation, which the spec
  * suite cross-checks the core against).
  *
  * All arithmetic is integer-exact, so the pure-python worker twin
  * (`scripts/media_worker.py`) is bit-identical by construction — the
  * same property the JPEG/GIF/G.711 family relies on.
  *
  * WAV framing (fmt 0x11, mono): each `nBlockAlign`-byte block is a
  * 4-byte header (initial predictor as int16 LE, step index as u8, one
  * reserved byte) followed by nibble-packed deltas, LOW nibble first —
  * note `audioop`'s raw DVI stream is HIGH nibble first; the spec
  * cross-check feeds it nibble-swapped bytes. A block decodes to
  * `1 + (nBlockAlign - 4) * 2` samples.
  */
object Adpcm {

  /** IMA step-size table (89 entries, spec constants). */
  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index-adaptation table (16 entries, spec constants). */
  val IndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** One decode step: nibble against (predictor, index) state; returns
    * the new packed state `(pred << 8) | idx` — pred in [-32768, 32767],
    * idx in [0, 88]. */
  @inline private def step(nibble: Int, pred0: Int, idx0: Int): Long = {
    val st = StepTable(idx0)
    var diff = st >> 3
    if ((nibble & 1) != 0) diff += st >> 2
    if ((nibble & 2) != 0) diff += st >> 1
    if ((nibble & 4) != 0) diff += st
    var pred = if ((nibble & 8) != 0) pred0 - diff else pred0 + diff
    if (pred < -32768) pred = -32768 else if (pred > 32767) pred = 32767
    var idx = idx0 + IndexTable(nibble)
    if (idx < 0) idx = 0 else if (idx > 88) idx = 88
    (pred.toLong << 8) | idx
  }

  /** Decode a raw nibble sequence from an explicit initial state — the
    * core the `audioop` differential spec drives directly. */
  def decodeCore(nibbles: Array[Int], pred0: Int, idx0: Int): Array[Short] = {
    val out = new Array[Short](nibbles.length)
    var pred = pred0; var idx = idx0
    var i = 0
    while (i < nibbles.length) {
      val s = step(nibbles(i), pred, idx)
      pred = (s >> 8).toInt; idx = (s & 0xff).toInt
      out(i) = pred.toShort
      i += 1
    }
    out
  }

  /** Decode a mono WAV IMA-ADPCM data chunk (`blockAlign`-byte blocks,
    * low nibble first). Real-world conventions honored (advice round
    * 18): a SHORT FINAL BLOCK (>= 4-byte header, decoding to
    * `1 + (blockBytes-4)*2` samples) is accepted, and when the WAV
    * carries a `fact` chunk its sample count trims the zero-padded
    * encoder tail — the same trim ffmpeg applies; `audioop` has no
    * framing layer so the differential spec drives [[decodeCore]]
    * directly. `factSamples < 0` means "no fact chunk" (keep every
    * decoded sample, the old behavior). Malformed framing errors
    * loudly. */
  def decodeWavBlocks(
      b: Array[Byte], off: Int, len: Long, blockAlign: Int,
      factSamples: Long = -1L): Array[Short] = {
    require(blockAlign >= 8 && blockAlign % 4 == 0,
      s"bad IMA-ADPCM block align $blockAlign (mono blocks are >= 8, /4)")
    val tailBytes = (len % blockAlign).toInt
    require(tailBytes == 0 || tailBytes >= 4,
      s"truncated IMA-ADPCM data: final block is $tailBytes bytes (< 4-byte header)")
    val nFull = (len / blockAlign).toInt
    val nBlocks = nFull + (if (tailBytes > 0) 1 else 0)
    val perBlock = 1 + (blockAlign - 4) * 2
    val total = nFull * perBlock +
      (if (tailBytes > 0) 1 + (tailBytes - 4) * 2 else 0)
    val out = new Array[Short](total)
    var o = 0
    var blk = 0
    while (blk < nBlocks) {
      val base = off + blk * blockAlign
      val blockBytes = if (blk < nFull) blockAlign else tailBytes
      var pred = ((b(base) & 0xff) | ((b(base + 1) & 0xff) << 8)).toShort.toInt
      var idx = b(base + 2) & 0xff
      require(idx <= 88, s"corrupt IMA-ADPCM block: step index $idx > 88")
      out(o) = pred.toShort; o += 1
      var i = base + 4
      val end = base + blockBytes
      while (i < end) {
        val byte = b(i) & 0xff
        var s = step(byte & 0xf, pred, idx) // low nibble first (WAV)
        pred = (s >> 8).toInt; idx = (s & 0xff).toInt
        out(o) = pred.toShort; o += 1
        s = step((byte >> 4) & 0xf, pred, idx)
        pred = (s >> 8).toInt; idx = (s & 0xff).toInt
        out(o) = pred.toShort; o += 1
        i += 1
      }
      blk += 1
    }
    if (factSamples < 0 || factSamples == total) out
    else {
      require(factSamples <= total,
        s"corrupt IMA-ADPCM WAV: fact chunk claims $factSamples samples " +
          s"but the data chunk decodes to $total")
      // the trim may only eat into the LAST block — bound by that
      // block's own capacity (a short final block holds fewer than
      // perBlock samples; using perBlock here would let a fact count
      // silently discard the whole tail block — self-review round 19)
      val lastBlockSamples =
        if (tailBytes > 0) 1 + (tailBytes - 4) * 2 else perBlock
      require(factSamples > total - lastBlockSamples,
        s"corrupt IMA-ADPCM WAV: fact count $factSamples leaves the whole " +
          s"trailing block unused ($total decoded, last block holds " +
          s"$lastBlockSamples)")
      java.util.Arrays.copyOf(out, factSamples.toInt)
    }
  }

  /** Encode mono PCM16 into WAV IMA-ADPCM blocks (fixture/synthetic
    * generator — the inverse of [[decodeWavBlocks]]; the tail is
    * zero-padded to a whole block, the WAV writer's convention). The
    * quantizer is the standard one: emit the nibble whose decode step
    * lands nearest below the target delta, then advance the SHARED
    * state with the same [[step]] the decoder uses. */
  def encodeWavBlocks(samples: Array[Short], blockAlign: Int): Array[Byte] = {
    require(blockAlign >= 8 && blockAlign % 4 == 0,
      s"bad IMA-ADPCM block align $blockAlign")
    require(samples.nonEmpty, "cannot encode an empty sample stream")
    val perBlock = 1 + (blockAlign - 4) * 2
    val nBlocks = (samples.length + perBlock - 1) / perBlock
    val out = new Array[Byte](nBlocks * blockAlign)
    var pred = 0; var idx = 0
    var si = 0
    var blk = 0
    while (blk < nBlocks) {
      val base = blk * blockAlign
      pred = samples(math.min(si, samples.length - 1)).toInt
      out(base) = (pred & 0xff).toByte
      out(base + 1) = ((pred >> 8) & 0xff).toByte
      out(base + 2) = idx.toByte
      si += 1
      var i = base + 4
      while (i < base + blockAlign) {
        var byte = 0
        var half = 0
        while (half < 2) {
          val target =
            (if (si < samples.length) samples(si) else 0).toInt
          val st = StepTable(idx)
          var delta = target - pred
          var nib = 0
          if (delta < 0) { nib = 8; delta = -delta }
          if (delta >= st) { nib |= 4; delta -= st }
          if (delta >= (st >> 1)) { nib |= 2; delta -= st >> 1 }
          if (delta >= (st >> 2)) { nib |= 1 }
          val s = step(nib, pred, idx)
          pred = (s >> 8).toInt; idx = (s & 0xff).toInt
          byte |= (if (half == 0) nib else nib << 4) // low nibble first
          si += 1
          half += 1
        }
        out(i) = byte.toByte
        i += 1
      }
      blk += 1
    }
    out
  }

  /** Wrap IMA-ADPCM blocks as a complete mono WAV (fmt 0x11, with the
    * `fact` chunk real encoders write — carrying the TRUE sample count,
    * so a decoder honoring it trims the final block's zero-padded tail
    * exactly as ffmpeg does; [[decodeWavBlocks]] round-trips to the
    * input length). */
  def buildWavAdpcm(
      sampleRate: Int, samples: Array[Short], blockAlign: Int = 256): Array[Byte] = {
    val data = encodeWavBlocks(samples, blockAlign)
    val perBlock = 1 + (blockAlign - 4) * 2
    val nSamples = samples.length
    val out = new Array[Byte](12 + 8 + 20 + 8 + 4 + 8 + data.length)
    def put16(off: Int, v: Int): Unit = Multimodal.put16(out, off, v)
    def put32(off: Int, v: Long): Unit = Multimodal.put32(out, off, v)
    def putTag(off: Int, s: String): Unit =
      Multimodal.putTag(out, off, s)
    putTag(0, "RIFF"); put32(4, out.length.toLong - 8); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 20L)
    put16(20, 0x11)                 // wFormatTag = IMA ADPCM
    put16(22, 1)                    // channels (mono)
    put32(24, sampleRate.toLong)
    put32(28, sampleRate.toLong * blockAlign / perBlock) // avg bytes/sec
    put16(32, blockAlign)
    put16(34, 4)                    // bits per (coded) sample
    put16(36, 2)                    // cbSize
    put16(38, perBlock)             // wSamplesPerBlock
    putTag(40, "fact"); put32(44, 4L); put32(48, nSamples.toLong)
    putTag(52, "data"); put32(56, data.length.toLong)
    System.arraycopy(data, 0, out, 60, data.length)
    out
  }
}
