package graft.ext

/** Baseline JPEG codec — the entropy-coded image format a real corpus
  * hits first (the reference, `alan-turing-institute/paqarin`, has no
  * media surface at all; this is north-star extension work, built from
  * the PUBLIC ITU-T T.81 spec: marker structure §B, Huffman coding §C/F,
  * the Annex-K example quantization + Huffman tables, JFIF color space).
  * No codec library exists in this container, so both sides of the seam
  * are from-scratch byte-walkers: this JVM decoder runs in-task behind
  * [[Multimodal.decodeReal]], and `scripts/media_worker.py` carries the
  * pure-numpy twin that must agree BIT-for-bit over the Arrow IPC seam.
  *
  * Determinism contract (what makes bit-exact cross-language parity
  * possible for a DCT codec): every arithmetic step is integer —
  *  - the 1-D DCT basis is the HARDCODED fixed-point table `Dct13`
  *    (`round(alpha(u) cos((2x+1)u pi/16) * 2^13)`), never recomputed
  *    from transcendentals at runtime (a last-ulp `cos` difference
  *    between languages could flip a rounded sample);
  *  - the 2-D IDCT accumulates in Long (max |acc| < 2^50) and emits
  *    `((acc + 2^27) >> 28) + 128` — arithmetic shift = floor division
  *    in both Scala and Python;
  *  - YCbCr→RGB uses 16.16 fixed-point constants with the same
  *    `(x + 32768) >> 16` rounding;
  *  - chroma upsampling is index replication (`sy = y * v / vmax`).
  *
  * Supported: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
  * sampling factors 1–2 (4:4:4, 4:2:0, 4:2:2, ...), restart intervals,
  * FF00 byte stuffing, multi-table DQT/DHT markers, APPn/COM skip.
  * Everything else — progressive (SOF2), arithmetic coding, 12-bit,
  * 16-bit quant tables — fails loudly: a silent wrong decode poisons
  * every downstream feature (same posture as [[Multimodal.bmpPixels]]).
  *
  * The [[encode]] side exists for fixtures and the golden query's
  * synthetic payloads ([[Multimodal.synthJpeg]]): quality-scaled Annex-K
  * tables, optional 4:2:0 box subsampling, optional restart markers,
  * optional grayscale. Encode→decode is lossy by design; the decode of a
  * committed fixture is pinned byte-exact instead (MultimodalSpec).
  */
object Jpeg {

  // ——— public-spec constant tables ———

  /** Zigzag scan: raster index of the k-th coefficient (T.81 Figure 5). */
  private[ext] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** T.81 Table K.1 — example luminance quantization (raster order). */
  val QLumaBase: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** T.81 Table K.2 — example chrominance quantization (raster order). */
  private[ext] val QChromaBase: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // T.81 Annex K.3 — the "typical" Huffman tables every baseline encoder
  // ships. BITS = code count per length 1..16; VALS = symbols in order.
  private[ext] val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private[ext] val DcLumaVals = (0 to 11).toArray
  private[ext] val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private[ext] val DcChromaVals = (0 to 11).toArray
  private[ext] val AcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private[ext] val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)
  private[ext] val AcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
  private[ext] val AcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)

  /** Fixed-point 1-D DCT basis, `round(alpha(u) cos((2x+1)u pi/16) *
    * 2^13)` — HARDCODED (never recomputed from `cos` at runtime) so the
    * numpy twin's identical literal table yields identical Long
    * arithmetic. Indexed `Dct13(u)(x)`. */
  private[ext] val Dct13: Array[Array[Long]] = Array(
    Array(5793L, 5793L, 5793L, 5793L, 5793L, 5793L, 5793L, 5793L),
    Array(8035L, 6811L, 4551L, 1598L, -1598L, -4551L, -6811L, -8035L),
    Array(7568L, 3135L, -3135L, -7568L, -7568L, -3135L, 3135L, 7568L),
    Array(6811L, -1598L, -8035L, -4551L, 4551L, 8035L, 1598L, -6811L),
    Array(5793L, -5793L, -5793L, 5793L, 5793L, -5793L, -5793L, 5793L),
    Array(4551L, -8035L, 1598L, 6811L, -6811L, -1598L, 8035L, -4551L),
    Array(3135L, -7568L, 7568L, -3135L, -3135L, 7568L, -7568L, 3135L),
    Array(1598L, -4551L, 6811L, -8035L, 8035L, -6811L, 4551L, -1598L))

  /** IJG-convention quality scaling of a base quantization table:
    * quality 1–100, 50 = the Annex-K table as-is, higher = finer. */
  def scaledQuant(base: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"quality must be 1..100, got $quality")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map(q => math.min(255, math.max(1, (q * scale + 50) / 100)))
  }

  // ——— Huffman table construction (T.81 Annex C) ———

  /** Canonical decode tables: per code length 1..16 the smallest and
    * largest code plus the index of the first symbol (Annex F.2.2.3). */
  private[ext] final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    private var code = 0
    private var k = 0
    for (l <- 1 to 16) {
      if (bits(l - 1) > 0) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = code - 1
      }
      code <<= 1
    }
    def symbols: Array[Int] = vals

    def decode(r: BitReader): Int = {
      var c = 0
      var l = 1
      while (l <= 16) {
        c = (c << 1) | r.nextBit()
        if (maxCode(l) >= 0 && c <= maxCode(l))
          return vals(valPtr(l) + c - minCode(l))
        l += 1
      }
      throw new IllegalArgumentException(
        "corrupt JPEG: Huffman code longer than 16 bits")
    }
  }

  /** Canonical (code, length) per symbol for encoding — same Annex-C
    * generation as [[HuffDecoder]], laid out for the writer. */
  private def buildEncoder(bits: Array[Int], vals: Array[Int]): (Array[Int], Array[Int]) = {
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        codeOf(vals(k)) = code
        lenOf(vals(k)) = l
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    (codeOf, lenOf)
  }

  // ——— bit I/O ———

  /** MSB-first entropy-stream reader with FF00 unstuffing. Any marker
    * other than a stuffed zero inside the stream fails loudly; restart
    * markers are consumed only at MCU boundaries via [[restart]]. */
  private[ext] final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0

    def nextBit(): Int = {
      if (nbits == 0) {
        require(pos < b.length, "truncated JPEG entropy stream")
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          require(pos < b.length, "truncated JPEG entropy stream at FF")
          val m = b(pos) & 0xff
          require(m == 0x00, f"unexpected marker 0xFF$m%02X inside " +
            "JPEG entropy stream (corrupt data or unsupported feature)")
          pos += 1
        }
        cur = v
        nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }

    /** Byte-align and consume an RSTn marker (T.81 §F.2.2.5). */
    def restart(): Unit = {
      nbits = 0 // discard padding bits
      require(pos + 1 < b.length, "truncated JPEG at restart marker")
      val ff = b(pos) & 0xff
      val m = b(pos + 1) & 0xff
      require(ff == 0xff && (m & 0xf8) == 0xd0,
        f"expected restart marker, found 0x$ff%02X$m%02X")
      pos += 2
    }
  }

  /** MSB-first entropy writer with FF00 stuffing; [[align]] pads the
    * trailing partial byte with 1-bits (T.81 §F.1.2.3). */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def align(): Unit =
      if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
  }

  // ——— integer IDCT / FDCT ———

  /** 2-D IDCT of one dequantized raster-order block into 0..255 samples.
    * All-Long accumulation (|acc| < 2^50), `((acc + 2^27) >> 28) + 128`
    * final rounding — identical in the numpy twin. */
  private[ext] def idctBlock(coef: Array[Long], outSamples: Array[Int]): Unit = {
    val t = new Array[Long](64) // t(cu*8 + y) = sum_cv Dct13(cv)(y) * F(cv, cu)
    var cu = 0
    while (cu < 8) {
      var y = 0
      while (y < 8) {
        var acc = 0L
        var cv = 0
        while (cv < 8) { acc += Dct13(cv)(y) * coef(cv * 8 + cu); cv += 1 }
        t(cu * 8 + y) = acc
        y += 1
      }
      cu += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0L
        var cu2 = 0
        while (cu2 < 8) { acc += Dct13(cu2)(x) * t(cu2 * 8 + y); cu2 += 1 }
        val v = (((acc + (1L << 27)) >> 28) + 128L).toInt
        outSamples(y * 8 + x) = if (v < 0) 0 else if (v > 255) 255 else v
        x += 1
      }
      y += 1
    }
  }

  /** 2-D forward DCT of one level-shifted block (samples - 128). */
  private def fdctBlock(s: Array[Int], outCoef: Array[Long]): Unit = {
    val t = new Array[Long](64) // t(cv*8 + x) = sum_y Dct13(cv)(y) * s(y, x)
    var cv = 0
    while (cv < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0L
        var y = 0
        while (y < 8) { acc += Dct13(cv)(y) * s(y * 8 + x); y += 1 }
        t(cv * 8 + x) = acc
        x += 1
      }
      cv += 1
    }
    var cv2 = 0
    while (cv2 < 8) {
      var cu = 0
      while (cu < 8) {
        var acc = 0L
        var x = 0
        while (x < 8) { acc += Dct13(cu)(x) * t(cv2 * 8 + x); x += 1 }
        outCoef(cv2 * 8 + cu) = (acc + (1L << 27)) >> 28
        cu += 1
      }
      cv2 += 1
    }
  }

  // ——— decoder ———

  private final case class Component(
      id: Int, h: Int, v: Int, tq: Int,
      var dcTab: Int = 0, var acTab: Int = 0)

  private def u16be(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Decode a baseline JPEG to (width, height, top-down RGB bytes) —
    * same return shape as [[Multimodal.bmpPixels]]. */
  def decode(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
      s"not a JPEG payload (${b.length} bytes)")
    val quant = new Array[Array[Int]](4)
    val dcDec = new Array[HuffDecoder](4)
    val acDec = new Array[HuffDecoder](4)
    var comps: Array[Component] = null
    var w = 0
    var h = 0
    var restartInterval = 0
    var pos = 2
    var sosPos = -1

    while (sosPos < 0) {
      require(pos + 1 < b.length, "truncated JPEG: no SOS marker")
      require((b(pos) & 0xff) == 0xff,
        f"corrupt JPEG: expected marker, found 0x${b(pos) & 0xff}%02X at $pos")
      // optional fill bytes: FF may repeat before the marker code
      while (pos + 1 < b.length && (b(pos + 1) & 0xff) == 0xff) pos += 1
      val marker = b(pos + 1) & 0xff
      pos += 2
      marker match {
        case 0xd8 => throw new IllegalArgumentException(
          "corrupt JPEG: SOI inside stream")
        case 0xd9 => throw new IllegalArgumentException(
          "corrupt JPEG: EOI before SOS")
        case 0x01 => () // TEM — standalone, no segment
        case m if m >= 0xd0 && m <= 0xd7 => throw new IllegalArgumentException(
          "corrupt JPEG: restart marker outside entropy stream")
        case _ =>
          require(pos + 2 <= b.length, "truncated JPEG marker segment")
          val len = u16be(b, pos)
          require(len >= 2 && pos + len <= b.length,
            s"truncated JPEG marker segment (claims $len bytes)")
          val seg = pos + 2
          val segEnd = pos + len
          marker match {
            case 0xc0 | 0xc1 => // baseline / extended-sequential Huffman
              require(seg + 6 <= segEnd, "truncated SOF")
              val precision = b(seg) & 0xff
              require(precision == 8,
                s"unsupported JPEG precision $precision (only 8-bit)")
              h = u16be(b, seg + 1); w = u16be(b, seg + 3)
              require(w > 0 && h > 0, s"unsupported JPEG dimensions ${w}x$h" +
                " (DNL-deferred height not supported)")
              // allocation guard: a crafted 200-byte payload claiming
              // 65500x65500 would OOM the executor before the entropy
              // stream could fail — cap at 64 MP (any real training
              // image is far smaller; raise in source if ever needed)
              require(w.toLong * h <= (64L << 20),
                s"unreasonable JPEG dimensions ${w}x$h (> 64 MP)")
              val nf = b(seg + 5) & 0xff
              require(nf == 1 || nf == 3,
                s"unsupported JPEG component count $nf (only 1 or 3)")
              require(seg + 6 + 3 * nf <= segEnd, "truncated SOF components")
              comps = Array.tabulate(nf) { i =>
                val o = seg + 6 + 3 * i
                val hv = b(o + 1) & 0xff
                val c = Component(b(o) & 0xff, hv >> 4, hv & 15, b(o + 2) & 0xff)
                require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
                  s"unsupported sampling factor ${c.h}x${c.v} (only 1-2)")
                require(c.tq < 4, s"bad quant table id ${c.tq}")
                c
              }
            case 0xc2 => throw new IllegalArgumentException(
              "unsupported JPEG: progressive DCT (SOF2) — baseline only")
            case m if (m >= 0xc3 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc =>
              throw new IllegalArgumentException(
                f"unsupported JPEG: SOF 0x$m%02X (baseline sequential only)")
            case 0xc4 => // DHT — possibly several tables in one marker
              var o = seg
              while (o < segEnd) {
                require(o + 17 <= segEnd, "truncated DHT")
                val tcth = b(o) & 0xff
                val tc = tcth >> 4; val th = tcth & 15
                require(tc <= 1 && th <= 3, s"bad DHT class/id $tc/$th")
                val bits = Array.tabulate(16)(i => b(o + 1 + i) & 0xff)
                val n = bits.sum
                require(n <= 256 && o + 17 + n <= segEnd, "truncated DHT values")
                val vals = Array.tabulate(n)(i => b(o + 17 + i) & 0xff)
                val dec = new HuffDecoder(bits, vals)
                if (tc == 0) dcDec(th) = dec else acDec(th) = dec
                o += 17 + n
              }
            case 0xdb => // DQT — possibly several tables in one marker
              var o = seg
              while (o < segEnd) {
                val pqtq = b(o) & 0xff
                val pq = pqtq >> 4; val tq = pqtq & 15
                require(pq == 0,
                  "unsupported JPEG: 16-bit quantization table (Pq=1)")
                require(tq < 4 && o + 65 <= segEnd, "truncated DQT")
                val q = new Array[Int](64)
                var k = 0
                while (k < 64) { q(Zigzag(k)) = b(o + 1 + k) & 0xff; k += 1 }
                quant(tq) = q
                o += 65
              }
            case 0xdd =>
              require(len == 4, "bad DRI length")
              restartInterval = u16be(b, seg)
            case 0xda =>
              require(comps != null, "corrupt JPEG: SOS before SOF")
              val ns = b(seg) & 0xff
              require(ns == comps.length,
                s"unsupported JPEG: scan has $ns of ${comps.length} " +
                  "components (only single interleaved scan)")
              require(seg + 1 + 2 * ns + 3 <= segEnd, "truncated SOS")
              var i = 0
              while (i < ns) {
                val cs = b(seg + 1 + 2 * i) & 0xff
                val tt = b(seg + 2 + 2 * i) & 0xff
                val c = comps.find(_.id == cs).getOrElse(
                  throw new IllegalArgumentException(
                    s"corrupt JPEG: scan component $cs not in frame"))
                c.dcTab = tt >> 4; c.acTab = tt & 15
                i += 1
              }
              val ss = b(seg + 1 + 2 * ns) & 0xff
              val se = b(seg + 2 + 2 * ns) & 0xff
              val ahal = b(seg + 3 + 2 * ns) & 0xff
              require(ss == 0 && se == 63 && ahal == 0,
                s"unsupported JPEG scan parameters Ss=$ss Se=$se AhAl=$ahal")
              sosPos = segEnd
            case m if (m >= 0xe0 && m <= 0xef) || m == 0xfe => () // APPn/COM
            case m => throw new IllegalArgumentException(
              f"unsupported JPEG marker 0x$m%02X")
          }
          if (sosPos < 0) pos = segEnd
      }
    }

    // entropy-coded scan
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcuW = 8 * hmax
    val mcuH = 8 * vmax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    val planes = comps.map { c =>
      new Array[Int](mcusX * 8 * c.h * mcusY * 8 * c.v)
    }
    comps.foreach { c =>
      require(dcDec(c.dcTab) != null && acDec(c.acTab) != null,
        s"corrupt JPEG: scan references undefined Huffman table")
      require(quant(c.tq) != null,
        s"corrupt JPEG: component references undefined quant table ${c.tq}")
    }
    val reader = new BitReader(b, sosPos)
    val pred = new Array[Int](comps.length)
    val coef = new Array[Long](64)
    val samples = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        reader.restart()
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = quant(c.tq)
        val dc = dcDec(c.dcTab)
        val ac = acDec(c.acTab)
        val planeW = mcusX * 8 * c.h
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0L)
            // DC: size category + EXTEND (T.81 F.2.2.1)
            val t = dc.decode(reader)
            require(t <= 11, s"corrupt JPEG: DC size category $t")
            val diff = if (t == 0) 0 else extend(reader.receive(t), t)
            pred(ci) += diff
            coef(0) = pred(ci).toLong * q(0)
            // AC: run/size with EOB and ZRL (T.81 F.2.2.2)
            var k = 1
            var done = false
            while (!done && k < 64) {
              val rs = ac.decode(reader)
              val r = rs >> 4
              val s = rs & 15
              if (s == 0) {
                if (r == 15) k += 16 // ZRL: skip 16 zeros
                else done = true     // EOB
              } else {
                k += r
                require(k < 64, "corrupt JPEG: AC coefficient index > 63")
                val z = Zigzag(k)
                coef(z) = extend(reader.receive(s), s).toLong * q(z)
                k += 1
              }
            }
            idctBlock(coef, samples)
            val px0 = (mx * c.h + bx) * 8
            val py0 = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              val rowBase = (py0 + yy) * planeW + px0
              while (xx < 8) {
                planes(ci)(rowBase + xx) = samples(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // color reconstruction: replicate-upsample chroma, YCbCr -> RGB
    // (JFIF full-range, 16.16 fixed point — same constants in the twin)
    val rgb = new Array[Byte](w * h * 3)
    val yPlaneW = mcusX * 8 * comps(0).h
    if (comps.length == 1) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = planes(0)(y * yPlaneW + x).toByte
          val d = (y * w + x) * 3
          rgb(d) = v; rgb(d + 1) = v; rgb(d + 2) = v
          x += 1
        }
        y += 1
      }
    } else {
      val yc = comps(0); val cb = comps(1); val cr = comps(2)
      val cbW = mcusX * 8 * cb.h
      val crW = mcusX * 8 * cr.h
      var y = 0
      while (y < h) {
        val yY = y * yc.v / vmax
        val cbY = y * cb.v / vmax
        val crY = y * cr.v / vmax
        var x = 0
        while (x < w) {
          val yv = planes(0)(yY * yPlaneW + x * yc.h / hmax)
          val cbv = planes(1)(cbY * cbW + x * cb.h / hmax) - 128
          val crv = planes(2)(crY * crW + x * cr.h / hmax) - 128
          val d = (y * w + x) * 3
          rgb(d) = clamp8(yv + ((91881 * crv + 32768) >> 16))
          rgb(d + 1) = clamp8(yv - ((22554 * cbv + 46802 * crv + 32768) >> 16))
          rgb(d + 2) = clamp8(yv + ((116130 * cbv + 32768) >> 16))
          x += 1
        }
        y += 1
      }
    }
    (w, h, rgb)
  }

  /** T.81 F.2.2.1 EXTEND: map an s-bit unsigned value to its signed
    * coefficient. */
  private[ext] def extend(v: Int, s: Int): Int =
    if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def clamp8(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  // ——— encoder ———

  /** Encode top-down RGB as a baseline JFIF JPEG. `subsample` = 4:2:0
    * (2x2 box-averaged chroma), else 4:4:4; `restartInterval` > 0 emits
    * DRI + RSTn markers every that many MCUs; `gray` encodes a single
    * luminance component (the RGB is converted; callers pass gray
    * images as R=G=B). */
  def encode(
      w: Int,
      h: Int,
      rgbTopDown: Array[Byte],
      quality: Int = 90,
      subsample: Boolean = false,
      restartInterval: Int = 0,
      gray: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    require(rgbTopDown.length == w * h * 3,
      s"need ${w * h * 3} RGB bytes, got ${rgbTopDown.length}")
    require(restartInterval >= 0 && restartInterval <= 65535,
      s"restartInterval must be 0..65535, got $restartInterval")
    val qLuma = scaledQuant(QLumaBase, quality)
    val qChroma = scaledQuant(QChromaBase, quality)

    // color convert (16.16 fixed point, encoder-side only)
    val n = w * h
    val yP = new Array[Int](n)
    val cbP = new Array[Int](n)
    val crP = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = rgbTopDown(3 * i) & 0xff
      val g = rgbTopDown(3 * i + 1) & 0xff
      val bb = rgbTopDown(3 * i + 2) & 0xff
      yP(i) = clampI((19595 * r + 38470 * g + 7471 * bb + 32768) >> 16)
      cbP(i) = clampI(((-11059 * r - 21709 * g + 32768 * bb + 32768) >> 16) + 128)
      crP(i) = clampI(((32768 * r - 27439 * g - 5329 * bb + 32768) >> 16) + 128)
      i += 1
    }

    val yH = if (subsample && !gray) 2 else 1
    val yV = yH
    val hmax = yH; val vmax = yV
    val mcuW = 8 * hmax; val mcuH = 8 * vmax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH

    // build edge-replicated padded planes per component
    def padPlane(src: Array[Int], sw: Int, sh: Int, pw: Int, ph: Int): Array[Int] = {
      val out = new Array[Int](pw * ph)
      var y = 0
      while (y < ph) {
        val sy = math.min(y, sh - 1)
        var x = 0
        while (x < pw) {
          out(y * pw + x) = src(sy * sw + math.min(x, sw - 1))
          x += 1
        }
        y += 1
      }
      out
    }
    def subsample2x2(src: Array[Int], sw: Int, sh: Int): (Array[Int], Int, Int) = {
      val dw = (sw + 1) / 2; val dh = (sh + 1) / 2
      val out = new Array[Int](dw * dh)
      var y = 0
      while (y < dh) {
        val y0 = 2 * y
        val y1 = math.min(2 * y + 1, sh - 1)
        var x = 0
        while (x < dw) {
          val x0 = 2 * x
          val x1 = math.min(2 * x + 1, sw - 1)
          out(y * dw + x) = (src(y0 * sw + x0) + src(y0 * sw + x1) +
            src(y1 * sw + x0) + src(y1 * sw + x1) + 2) >> 2
          x += 1
        }
        y += 1
      }
      (out, dw, dh)
    }

    final case class EncComp(
        plane: Array[Int], planeW: Int, h: Int, v: Int,
        quant: Array[Int], dcBits: Array[Int], dcVals: Array[Int],
        acBits: Array[Int], acVals: Array[Int])
    val encComps: Array[EncComp] =
      if (gray)
        Array(EncComp(padPlane(yP, w, h, mcusX * 8, mcusY * 8), mcusX * 8,
          1, 1, qLuma, DcLumaBits, DcLumaVals, AcLumaBits, AcLumaVals))
      else {
        val yPlane = EncComp(
          padPlane(yP, w, h, mcusX * 8 * yH, mcusY * 8 * yV),
          mcusX * 8 * yH, yH, yV,
          qLuma, DcLumaBits, DcLumaVals, AcLumaBits, AcLumaVals)
        val (cbS, cw, ch) =
          if (subsample) subsample2x2(cbP, w, h) else (cbP, w, h)
        val (crS, _, _) =
          if (subsample) subsample2x2(crP, w, h) else (crP, w, h)
        Array(yPlane,
          EncComp(padPlane(cbS, cw, ch, mcusX * 8, mcusY * 8), mcusX * 8,
            1, 1, qChroma, DcChromaBits, DcChromaVals, AcChromaBits, AcChromaVals),
          EncComp(padPlane(crS, cw, ch, mcusX * 8, mcusY * 8), mcusX * 8,
            1, 1, qChroma, DcChromaBits, DcChromaVals, AcChromaBits, AcChromaVals))
      }

    val out = new java.io.ByteArrayOutputStream(1024)
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xe0); w16(16) // APP0 JFIF
    out.write('J'); out.write('F'); out.write('I'); out.write('F'); out.write(0)
    out.write(1); out.write(1) // version 1.1
    out.write(0); w16(1); w16(1); out.write(0); out.write(0)
    // DQT (both tables in one marker, zigzag order)
    val nQt = if (gray) 1 else 2
    marker(0xdb); w16(2 + 65 * nQt)
    out.write(0x00)
    for (k <- 0 until 64) out.write(qLuma(Zigzag(k)))
    if (!gray) {
      out.write(0x01)
      for (k <- 0 until 64) out.write(qChroma(Zigzag(k)))
    }
    // SOF0
    val nf = encComps.length
    marker(0xc0); w16(8 + 3 * nf)
    out.write(8); w16(h); w16(w); out.write(nf)
    for (ci <- 0 until nf) {
      out.write(ci + 1)
      out.write((encComps(ci).h << 4) | encComps(ci).v)
      out.write(if (ci == 0) 0 else 1)
    }
    // DHT (all tables in one marker)
    val huffSpecs =
      if (gray) Seq((0x00, DcLumaBits, DcLumaVals), (0x10, AcLumaBits, AcLumaVals))
      else Seq(
        (0x00, DcLumaBits, DcLumaVals), (0x10, AcLumaBits, AcLumaVals),
        (0x01, DcChromaBits, DcChromaVals), (0x11, AcChromaBits, AcChromaVals))
    marker(0xc4); w16(2 + huffSpecs.map(s => 17 + s._3.length).sum)
    huffSpecs.foreach { case (id, bits, vals) =>
      out.write(id)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    if (restartInterval > 0) { marker(0xdd); w16(4); w16(restartInterval) }
    // SOS
    marker(0xda); w16(6 + 2 * nf)
    out.write(nf)
    for (ci <- 0 until nf) {
      out.write(ci + 1)
      out.write(if (ci == 0) 0x00 else 0x11)
    }
    out.write(0); out.write(63); out.write(0)

    // entropy-coded data
    val (dcLumaCode, dcLumaLen) = buildEncoder(DcLumaBits, DcLumaVals)
    val (acLumaCode, acLumaLen) = buildEncoder(AcLumaBits, AcLumaVals)
    val (dcChromaCode, dcChromaLen) = buildEncoder(DcChromaBits, DcChromaVals)
    val (acChromaCode, acChromaLen) = buildEncoder(AcChromaBits, AcChromaVals)
    val bw = new BitWriter(out)
    val pred = new Array[Int](nf)
    val block = new Array[Int](64)
    val coef = new Array[Long](64)
    var rstIdx = 0
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.align()
        marker(0xd0 + rstIdx)
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < nf) {
        val c = encComps(ci)
        val luma = ci == 0
        val dcCode = if (luma) dcLumaCode else dcChromaCode
        val dcLen = if (luma) dcLumaLen else dcChromaLen
        val acCode = if (luma) acLumaCode else acChromaCode
        val acLen = if (luma) acLumaLen else acChromaLen
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            val px0 = (mx * c.h + bx) * 8
            val py0 = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                block(yy * 8 + xx) =
                  c.plane((py0 + yy) * c.planeW + px0 + xx) - 128
                xx += 1
              }
              yy += 1
            }
            fdctBlock(block, coef)
            // quantize: round-half-up via floorDiv(2F + q, 2q)
            var k = 0
            val qv = new Array[Int](64)
            while (k < 64) {
              val z = Zigzag(k)
              qv(k) = Math.floorDiv(2 * coef(z) + c.quant(z),
                2L * c.quant(z)).toInt
              k += 1
            }
            // DC
            val diff = qv(0) - pred(ci)
            pred(ci) = qv(0)
            val dSize = magnitudeSize(diff)
            bw.put(dcCode(dSize), dcLen(dSize))
            if (dSize > 0) bw.put(magBits(diff, dSize), dSize)
            // AC with run-lengths, ZRL, EOB
            var run = 0
            var kk = 1
            while (kk < 64) {
              val v = qv(kk)
              if (v == 0) run += 1
              else {
                while (run > 15) {
                  bw.put(acCode(0xf0), acLen(0xf0)); run -= 16
                }
                val s = magnitudeSize(v)
                val rs = (run << 4) | s
                bw.put(acCode(rs), acLen(rs))
                bw.put(magBits(v, s), s)
                run = 0
              }
              kk += 1
            }
            if (run > 0) bw.put(acCode(0x00), acLen(0x00)) // EOB
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    bw.align()
    marker(0xd9) // EOI
    out.toByteArray
  }

  private def clampI(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Bit length of |v| (size category), 0 for 0. */
  private def magnitudeSize(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** The s low bits encoding v's magnitude (negative values offset by
    * 2^s - 1, T.81 §F.1.2.1). */
  private def magBits(v: Int, s: Int): Int =
    if (v < 0) v + (1 << s) - 1 else v
}
