package graft.functions

/**
 * C12 — REAL baseline JPEG (ITU-T T.81 / JFIF) pixel codec in pure JVM,
 * closing the JPEG leg of the multimodal decode stub:
 *
 *  - [[encodeJpegPixels]]: a complete baseline sequential encoder —
 *    JFIF/YCbCr conversion, 4:4:4 sampling, Annex-K quantization tables
 *    with libjpeg quality scaling, forward DCT, zigzag, DC prediction,
 *    Annex-K Huffman tables, MSB-first bit packing with 0xFF byte
 *    stuffing.
 *  - [[decodeJpegPixels]]: a baseline decoder for ANY conformant
 *    baseline stream, not just ours — arbitrary DHT/DQT tables
 *    (canonical Huffman reconstruction), sampling factors up to 2×2
 *    (4:4:4 / 4:2:2 / 4:2:0 with libjpeg's fancy triangle upsampling,
 *    same weights and rounding constants), restart markers, byte
 *    unstuffing. Progressive (SOF2) and arithmetic streams are
 *    rejected with null, never garbage.
 *
 * Exactness contract (pinned in `MultimodalSpec`): JPEG is lossy and the
 * spec (T.81 §A.3.3) allows small IDCT variance between conformant
 * implementations, so cross-decoder agreement is ±1 per channel rather
 * than bit-exact — our decoder vs the JDK's ImageIO reader on our
 * streams, and on ImageIO-written streams. Our own encode→decode is
 * deterministic (pure double-precision DCT, fixed tables).
 *
 * Decoding runs executor-side inside the batched mapPartitions feature
 * stage — per-row byte arithmetic, no driver involvement.
 */
object JpegCodecUtil {

  // -------------------------------------------------------------------
  // Tables (ITU-T T.81 Annex K)
  // -------------------------------------------------------------------

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val QLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private val QChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  private val DcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = Array.range(0, 12)
  private val DcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = Array.range(0, 12)

  private val AcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  private val AcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** bits(1..16) + vals → canonical (code, length) per symbol value. */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Array[Array[Int]] = {
    // result(symbol) = Array(code, length)
    val out = new Array[Array[Int]](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len)) {
        out(vals(k)) = Array(code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out
  }

  private def scaledTable(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map(v => math.max(1, math.min(255, (v * scale + 50) / 100)))
  }

  // -------------------------------------------------------------------
  // Forward / inverse DCT (double precision — deterministic on the JVM)
  // -------------------------------------------------------------------

  private val DctCos: Array[Double] = {
    val c = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        // StrictMath: bit-identical basis tables on every JVM/platform
        c(u * 8 + x) = StrictMath.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    c
  }

  private def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += block(y * 8 + x) * DctCos(u * 8 + x) * DctCos(v * 8 + y)
            x += 1
          }
          y += 1
        }
        val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
        out(v * 8 + u) = 0.25 * cu * cv * s
        u += 1
      }
      v += 1
    }
    out
  }

  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val c = coef(v * 8 + u)
            if (c != 0) {
              val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
              val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
              s += cu * cv * c * DctCos(u * 8 + x) * DctCos(v * 8 + y)
            }
            u += 1
          }
          v += 1
        }
        val p = math.round(0.25 * s).toInt + 128
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  // -------------------------------------------------------------------
  // Encoder
  // -------------------------------------------------------------------

  private final class BitWriter(val out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { // pad with 1s
      acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1)
      out.write(acc & 0xFF)
      if ((acc & 0xFF) == 0xFF) out.write(0x00)
      acc = 0; n = 0
    }
  }

  private def magnitude(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** Encode an RGB image (pixelOf(x, y) = 0xRRGGBB) as baseline JFIF
    * 4:4:4 at the given libjpeg-style quality. */
  def encodeJpegPixels(width: Int, height: Int, quality: Int,
                       pixelOf: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xFFFF && height <= 0xFFFF)
    val qY = scaledTable(QLuma, quality)
    val qC = scaledTable(QChroma, quality)
    val dcY = canonicalCodes(DcLumaBits, DcLumaVals)
    val dcC = canonicalCodes(DcChromaBits, DcChromaVals)
    val acY = canonicalCodes(AcLumaBits, AcLumaVals)
    val acC = canonicalCodes(AcChromaBits, AcChromaVals)

    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
      body.foreach(b => out.write(b & 0xFF))
    }
    marker(0xD8) // SOI
    seg(0xE0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0
    seg(0xDB, 0 +: ZigZag.map(qY(_)))                                  // DQT 0
    seg(0xDB, 1 +: ZigZag.map(qC(_)))                                  // DQT 1
    seg(0xC0, Array(8, (height >> 8) & 0xFF, height & 0xFF,            // SOF0
      (width >> 8) & 0xFF, width & 0xFF, 3,
      1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(0xC4, (0x00 +: DcLumaBits.drop(1)) ++ DcLumaVals)              // DHT
    seg(0xC4, (0x10 +: AcLumaBits.drop(1)) ++ AcLumaVals)
    seg(0xC4, (0x01 +: DcChromaBits.drop(1)) ++ DcChromaVals)
    seg(0xC4, (0x11 +: AcChromaBits.drop(1)) ++ AcChromaVals)
    seg(0xDA, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))           // SOS

    val bw = new BitWriter(out)
    val dcPred = new Array[Int](3)
    val block = new Array[Double](64)

    def emitBlock(comp: Int, sample: (Int, Int) => Int): Unit = {
      val q = if (comp == 0) qY else qC
      val dcT = if (comp == 0) dcY else dcC
      val acT = if (comp == 0) acY else acC
      var i = 0
      while (i < 64) { block(i) = sample(i % 8, i / 8) - 128.0; i += 1 }
      val f = fdct(block)
      val zz = new Array[Int](64)
      i = 0
      while (i < 64) {
        zz(i) = math.round(f(ZigZag(i)) / q(ZigZag(i))).toInt
        i += 1
      }
      // DC
      val diff = zz(0) - dcPred(comp)
      dcPred(comp) = zz(0)
      val sz = magnitude(diff)
      val c0 = dcT(sz)
      bw.put(c0(0), c0(1))
      if (sz > 0) bw.put(if (diff >= 0) diff else diff + (1 << sz) - 1, sz)
      // AC
      var run = 0
      i = 1
      while (i < 64) {
        if (zz(i) == 0) run += 1
        else {
          while (run > 15) { val z = acT(0xF0); bw.put(z(0), z(1)); run -= 16 }
          val s = magnitude(zz(i))
          val c = acT((run << 4) | s)
          bw.put(c(0), c(1))
          bw.put(if (zz(i) >= 0) zz(i) else zz(i) + (1 << s) - 1, s)
          run = 0
        }
        i += 1
      }
      if (run > 0) { val e = acT(0x00); bw.put(e(0), e(1)) } // EOB
    }

    val bw8 = (width + 7) / 8
    val bh8 = (height + 7) / 8
    var by = 0
    while (by < bh8) {
      var bx = 0
      while (bx < bw8) {
        // edge-replicated 8x8 RGB → YCbCr planes for this block
        val ys = new Array[Int](64); val cbs = new Array[Int](64); val crs = new Array[Int](64)
        var j = 0
        while (j < 64) {
          val px = math.min(width - 1, bx * 8 + j % 8)
          val py = math.min(height - 1, by * 8 + j / 8)
          val rgb = pixelOf(px, py)
          val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
          def clamp(d: Double): Int = { val v = math.round(d).toInt; if (v < 0) 0 else if (v > 255) 255 else v }
          ys(j) = clamp(0.299 * r + 0.587 * g + 0.114 * b)
          cbs(j) = clamp(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0)
          crs(j) = clamp(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)
          j += 1
        }
        emitBlock(0, (x, y) => ys(y * 8 + x))
        emitBlock(1, (x, y) => cbs(y * 8 + x))
        emitBlock(2, (x, y) => crs(y * 8 + x))
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  // -------------------------------------------------------------------
  // Decoder
  // -------------------------------------------------------------------

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // canonical decode: minCode/maxCode/valPtr per length
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var len = 1
      while (len <= 16) {
        valPtr(len) = k
        minCode(len) = code
        code += bits(len); k += bits(len)
        maxCode(len) = if (bits(len) > 0) code - 1 else -1
        code <<= 1
        len += 1
      }
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + code - minCode(len))
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    var marker = 0 // pending RST/EOI marker code, 0 = none
    def bit(): Int = {
      if (n == 0) {
        if (marker != 0 || pos >= b.length) return -1
        var byte = b(pos) & 0xFF
        pos += 1
        if (byte == 0xFF) {
          if (pos >= b.length) return -1
          val m = b(pos) & 0xFF
          if (m == 0x00) pos += 1 // stuffed 0xFF data byte
          else { marker = m; return -1 }
        }
        acc = byte; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def bits(len: Int): Int = {
      var v = 0; var i = 0
      while (i < len) { val x = bit(); if (x < 0) return -1; v = (v << 1) | x; i += 1 }
      v
    }
    /** Align to byte boundary and consume an expected RST marker. */
    def resync(): Boolean = {
      n = 0
      if (marker == 0) { // marker not yet seen: scan forward
        while (pos + 1 < b.length && !((b(pos) & 0xFF) == 0xFF && (b(pos + 1) & 0xFF) != 0x00))
          pos += 1
        if (pos + 1 >= b.length) return false
        marker = b(pos + 1) & 0xFF
        pos += 2
      }
      if (marker >= 0xD0 && marker <= 0xD7) { marker = 0; true } else false
    }
  }

  private def decodeHuff(br: BitReader, t: HuffTable): Int = {
    var code = br.bit()
    if (code < 0) return -1
    var len = 1
    while (len <= 16) {
      if (t.maxCode(len) >= 0 && code <= t.maxCode(len)) return t.value(len, code)
      val x = br.bit()
      if (x < 0) return -1
      code = (code << 1) | x
      len += 1
    }
    -1
  }

  private def extend(v: Int, sz: Int): Int =
    if (sz == 0) 0 else if (v < (1 << (sz - 1))) v - (1 << sz) + 1 else v

  /** Decode the first scan of a baseline JFIF stream → packed
    * (r<<24|g<<16|b<<8|255) pixels row-major, or null for anything that
    * is not a decodable baseline sequential JPEG. */
  def decodeJpegPixels(b: Array[Byte]): Array[Int] =
    try decodeJpegPixels0(b)
    catch { // malformed segments must fall through, never kill the task
      case _: IndexOutOfBoundsException | _: NegativeArraySizeException => null
    }

  private def decodeJpegPixels0(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return null
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var width = 0; var height = 0
    var nComp = 0
    val compId = new Array[Int](4); val compH = new Array[Int](4)
    val compV = new Array[Int](4); val compQ = new Array[Int](4)
    val compDc = new Array[Int](4); val compAc = new Array[Int](4)
    var restartInterval = 0
    var i = 2
    var sosAt = -1
    while (sosAt < 0 && i + 3 < b.length) {
      if ((b(i) & 0xFF) != 0xFF) return null
      val m = b(i + 1) & 0xFF
      if (m == 0xFF) { i += 1 }
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) i += 2
      else {
        val len = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
        if (len < 2 || i + 2 + len > b.length) return null
        val p0 = i + 4
        m match {
          case 0xC0 | 0xC1 => // baseline / extended sequential SOF
            if (len < 8) return null
            height = ((b(p0 + 1) & 0xFF) << 8) | (b(p0 + 2) & 0xFF)
            width = ((b(p0 + 3) & 0xFF) << 8) | (b(p0 + 4) & 0xFF)
            nComp = b(p0 + 5) & 0xFF
            if ((b(p0) & 0xFF) != 8 || width == 0 || height == 0 ||
                (nComp != 1 && nComp != 3)) return null
            if (len < 8 + 3 * nComp) return null // declared length must hold the components
            var c = 0
            while (c < nComp) {
              compId(c) = b(p0 + 6 + 3 * c) & 0xFF
              compH(c) = (b(p0 + 7 + 3 * c) & 0xFF) >> 4
              compV(c) = b(p0 + 7 + 3 * c) & 0x0F
              compQ(c) = b(p0 + 8 + 3 * c) & 0xFF
              if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2 ||
                  compQ(c) > 3) return null
              c += 1
            }
          case 0xC2 => return null // progressive: out of scope
          case 0xC4 =>
            var p = p0
            while (p < i + 2 + len) {
              if (p + 17 > i + 2 + len) return null // 16 length counts must fit
              val tc = (b(p) & 0xFF) >> 4; val th = b(p) & 0x0F
              if (tc > 1 || th > 3) return null
              val bits = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) { bits(l) = b(p + l) & 0xFF; total += bits(l); l += 1 }
              if (p + 17 + total > i + 2 + len) return null
              val vals = new Array[Int](total)
              var k = 0
              while (k < total) { vals(k) = b(p + 17 + k) & 0xFF; k += 1 }
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcT(th) = t else acT(th) = t
              p += 17 + total
            }
          case 0xDB =>
            var p = p0
            while (p < i + 2 + len) {
              val prec = (b(p) & 0xFF) >> 4; val id = b(p) & 0x0F
              if (id > 3) return null
              val n = if (prec == 0) 64 else 128
              if (p + 1 + n > i + 2 + len) return null
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) {
                t(ZigZag(k)) =
                  if (prec == 0) b(p + 1 + k) & 0xFF
                  else ((b(p + 1 + 2 * k) & 0xFF) << 8) | (b(p + 2 + 2 * k) & 0xFF)
                k += 1
              }
              qt(id) = t
              p += 1 + n
            }
          case 0xDD =>
            if (len < 4) return null
            restartInterval = ((b(p0) & 0xFF) << 8) | (b(p0 + 1) & 0xFF)
          case 0xDA =>
            if (len < 3) return null
            val ns = b(p0) & 0xFF
            if (ns != nComp || len < 6 + 2 * ns) return null
            var c = 0
            while (c < ns) {
              val id = b(p0 + 1 + 2 * c) & 0xFF
              val sel = b(p0 + 2 + 2 * c) & 0xFF
              var ci = 0
              while (ci < nComp && compId(ci) != id) ci += 1
              if (ci == nComp) return null
              compDc(ci) = sel >> 4; compAc(ci) = sel & 0x0F
              c += 1
            }
            sosAt = i + 2 + len
          case _ => () // APPn/COM/etc: skip
        }
        i += 2 + len
      }
    }
    if (sosAt < 0 || width == 0) return null
    var hmax = 1; var vmax = 1
    var c = 0
    while (c < nComp) {
      hmax = math.max(hmax, compH(c)); vmax = math.max(vmax, compV(c))
      if (qt(compQ(c)) == null) return null
      c += 1
    }
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    // per-component planes at sampled resolution (MCU-padded)
    val planeW = Array.tabulate(nComp)(c => mcusX * 8 * compH(c))
    val planes = Array.tabulate(nComp)(c => new Array[Int](planeW(c) * mcusY * 8 * compV(c)))

    val br = new BitReader(b, sosAt)
    val dcPred = new Array[Int](4)
    val coef = new Array[Int](64)
    val pix8 = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.resync()) return null
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      c = 0
      while (c < nComp) {
        val dct = dcT(compDc(c)); val act = acT(compAc(c))
        if (dct == null || act == null) return null
        val q = qt(compQ(c))
        var byy = 0
        while (byy < compV(c)) {
          var bxx = 0
          while (bxx < compH(c)) {
            java.util.Arrays.fill(coef, 0)
            val sz = decodeHuff(br, dct)
            if (sz < 0 || sz > 15) return null
            val diffBits = if (sz == 0) 0 else br.bits(sz)
            if (diffBits < 0) return null
            dcPred(c) += extend(diffBits, sz)
            coef(0) = dcPred(c) * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = decodeHuff(br, act)
              if (rs < 0) return null
              val run = rs >> 4; val size = rs & 0x0F
              if (size == 0) {
                if (run == 15) k += 16 else eob = true
              } else {
                k += run
                if (k > 63) return null
                val vb = br.bits(size)
                if (vb < 0) return null
                coef(ZigZag(k)) = extend(vb, size) * q(ZigZag(k))
                k += 1
              }
            }
            idct(coef, pix8)
            val ox = (mx * compH(c) + bxx) * 8
            val oy = (my * compV(c) + byy) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(c)((oy + yy) * planeW(c) + ox + xx) = pix8(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
            bxx += 1
          }
          byy += 1
        }
        c += 1
      }
      mcu += 1
    }

    // upsample subsampled components to full resolution with libjpeg's
    // "fancy" (triangle) filter — same weights and rounding constants, so
    // our 4:2:0 output matches the JDK's native reader within the IDCT
    // tolerance instead of differing by the upsampling method
    val fullW = mcusX * 8 * hmax
    val full = Array.tabulate(nComp) { ci =>
      val rh = hmax / compH(ci); val rv = vmax / compV(ci)
      if (rh == 1 && rv == 1) planes(ci)
      else upsampleFancy(planes(ci), planeW(ci), mcusY * 8 * compV(ci), rh, rv)
    }

    val out = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val rgba =
          if (nComp == 1) {
            val g = full(0)(y * fullW + x)
            (g << 24) | (g << 16) | (g << 8) | 0xFF
          } else {
            val yv = full(0)(y * fullW + x)
            val cb = full(1)(y * fullW + x) - 128
            val cr = full(2)(y * fullW + x) - 128
            def cl(d: Double): Int = { val v = math.round(d).toInt; if (v < 0) 0 else if (v > 255) 255 else v }
            val r = cl(yv + 1.402 * cr)
            val g = cl(yv - 0.344136 * cb - 0.714136 * cr)
            val bl = cl(yv + 1.772 * cb)
            (r << 24) | (g << 16) | (bl << 8) | 0xFF
          }
        out(y * width + x) = rgba
        x += 1
      }
      y += 1
    }
    out
  }

  /** libjpeg-style fancy upsampling (jdsample.c): 2× in a dimension blends
    * 3:1 toward the nearer source sample with the original rounding
    * constants; edges clamp (which degenerates to replication exactly as
    * libjpeg's special-cased first/last columns do). */
  private def upsampleFancy(in: Array[Int], inW: Int, inH: Int,
                            rh: Int, rv: Int): Array[Int] = {
    val outW = inW * rh; val outH = inH * rv
    val out = new Array[Int](outW * outH)
    val cs = new Array[Int](inW)
    var y = 0
    while (y < outH) {
      val r = y / rv
      if (rv == 2) {
        val far = if ((y & 1) == 0) math.max(r - 1, 0) else math.min(r + 1, inH - 1)
        var i = 0
        while (i < inW) { cs(i) = 3 * in(r * inW + i) + in(far * inW + i); i += 1 }
        if (rh == 2) { // h2v2: column sums through the horizontal triangle
          var x = 0
          while (x < inW) {
            val l = if (x > 0) cs(x - 1) else cs(0)
            val rr = if (x < inW - 1) cs(x + 1) else cs(inW - 1)
            out(y * outW + 2 * x) = (3 * cs(x) + l + 8) >> 4
            out(y * outW + 2 * x + 1) = (3 * cs(x) + rr + 7) >> 4
            x += 1
          }
        } else {       // h1v2: vertical triangle only
          var x = 0
          while (x < inW) {
            out(y * outW + x) = (cs(x) + 2) >> 2
            x += 1
          }
        }
      } else {         // rv == 1
        if (rh == 2) { // h2v1
          var x = 0
          while (x < inW) {
            val s = in(r * inW + x)
            val l = if (x > 0) in(r * inW + x - 1) else s
            val rr = if (x < inW - 1) in(r * inW + x + 1) else s
            out(y * outW + 2 * x) = (3 * s + l + 1) >> 2
            out(y * outW + 2 * x + 1) = (3 * s + rr + 2) >> 2
            x += 1
          }
        } else {
          System.arraycopy(in, r * inW, out, y * outW, inW)
        }
      }
      y += 1
    }
    out
  }
}
