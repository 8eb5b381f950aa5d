package graft.functions

import java.security.MessageDigest

/**
 * FLAC codec (RFC 9639 / the xiph FLAC format) — REAL compressed-audio
 * encode + decode for the multimodal family, closing the "compressed
 * audio" stand-in for the lossless case: FLAC is pure integer
 * arithmetic (fixed linear predictors + Rice-coded residuals, CRC-8 /
 * CRC-16 framing, an MD5 of the unencoded signal in STREAMINFO), so a
 * JVM implementation is the full codec, not a shim — and because the
 * format is LOSSLESS, exactness is testable end-to-end:
 * decode(encode(x)) must equal x bit-for-bit and the STREAMINFO MD5
 * must match the decoded signal.
 *
 * Encoder subset (always valid FLAC): independent channels, per-frame
 * choice of CONSTANT / VERBATIM / FIXED(0..2) subframes by smallest
 * estimated size, one Rice partition (order 0) with a per-subframe
 * parameter, fixed block size, frame-number coded-number field, both
 * CRCs, STREAMINFO with the spec's little-endian-sample MD5.
 *
 * Decoder (general for the features above plus what other encoders
 * emit on such streams): metadata-block walk (skips non-STREAMINFO
 * blocks), all block-size/sample-rate header codings, UTF-8-style
 * coded numbers, wasted bits, CONSTANT / VERBATIM / FIXED(0..4)
 * subframes, 4- and 5-bit Rice methods with arbitrary partition
 * orders and escape codes, and the stereo decorrelations
 * (left/side, right/side, mid/side). CRC-8, CRC-16, the total-sample
 * count and the MD5 are all VERIFIED — any mismatch returns null
 * rather than wrong samples.
 *
 * Remaining multimodal stand-ins after this: H.264/HEVC video and
 * lossy transform audio (AAC/Vorbis sample decode) — genuine
 * psychoacoustic-codec-library territory; their CONTAINERS already
 * parse for real ([[MediaCodecUtil]]).
 */
object FlacCodecUtil {

  // ------------------------------------------------------------ bit io

  private[functions] final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nbits += 1
      if (nbits == 8) { buf.write(cur); cur = 0; nbits = 0 }
    }
    def write(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def writeUnary(n: Int): Unit = { var i = 0; while (i < n) { writeBit(0); i += 1 }; writeBit(1) }
    def alignByte(): Unit = while (nbits != 0) writeBit(0)
    def toBytes: Array[Byte] = { require(nbits == 0, "unaligned"); buf.toByteArray }
  }

  private[functions] final class BitReader(b: Array[Byte], var pos: Int) {
    private var bit = 0
    def bytePos: Int = pos
    def aligned: Boolean = bit == 0
    def readBit(): Int = {
      if (pos >= b.length) throw new IndexOutOfBoundsException
      val v = (b(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def read(bits: Int): Long = {
      var v = 0L; var i = 0
      while (i < bits) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readUnary(): Int = { var n = 0; while (readBit() == 0) n += 1; n }
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  // ------------------------------------------------------------- crcs

  /** CRC-8, poly 0x07, init 0 (frame headers). */
  def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xFF
      var k = 0
      while (k < 8) { crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF; k += 1 }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0 (whole frames). */
  def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xFF) << 8
      var k = 0
      while (k < 8) { crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF else (crc << 1) & 0xFFFF; k += 1 }
      i += 1
    }
    crc
  }

  // -------------------------------------------------------- constants

  private val BlockSizeTable: Array[Int] = Array(
    -1, 192, 576, 1152, 2304, 4608, -2, -3, 256, 512, 1024, 2048, 4096,
    8192, 16384, 32768) // -2: 8-bit-1 follows, -3: 16-bit-1 follows
  private val SampleRateTable: Array[Int] = Array(
    0, 88200, 176400, 192000, 8000, 16000, 22050, 24000, 32000, 44100,
    48000, 96000, -2, -3, -4, -1) // 0: from streaminfo; -2..-4 follow; -1 invalid
  private val SampleSizeTable: Array[Int] = Array(0, 8, 12, -1, 16, 20, 24, 32)

  /** MD5 of the raw signal as the spec hashes it: interleaved samples,
    * little-endian, (bits/8) bytes each. */
  private def signalMd5(ch: Array[Array[Int]], bits: Int): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    val bytes = bits / 8
    val n = ch(0).length
    val one = new Array[Byte](bytes)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < ch.length) {
        val v = ch(c)(i)
        var k = 0
        while (k < bytes) { one(k) = ((v >> (8 * k)) & 0xFF).toByte; k += 1 }
        md.update(one)
        c += 1
      }
      i += 1
    }
    md.digest()
  }

  // ----------------------------------------------------------- encode

  /** Encode interleaved-by-channel PCM (each inner array one channel,
    * equal lengths) as a FLAC stream. `bits` ∈ {8, 16}. */
  def encodeFlac(channels: Array[Array[Int]], sampleRate: Int,
                 bits: Int = 16, blockSize: Int = 1024): Array[Byte] = {
    require(channels.nonEmpty && channels.length <= 8, "1..8 channels")
    require(bits == 8 || bits == 16, "8- or 16-bit input")
    require(sampleRate > 0 && sampleRate < (1 << 20))
    require(blockSize >= 16 && blockSize <= 65535)
    val n = channels(0).length
    require(n > 0 && channels.forall(_.length == n), "equal non-empty channels")
    val lim = 1 << (bits - 1)
    require(channels.forall(_.forall(v => v >= -lim && v < lim)), s"$bits-bit range")

    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (last-metadata flag set, type 0, length 34)
    val si = new BitWriter
    si.write(blockSize.toLong, 16); si.write(blockSize.toLong, 16)
    si.write(0L, 24); si.write(0L, 24) // frame sizes unknown
    si.write(sampleRate.toLong, 20)
    si.write((channels.length - 1).toLong, 3)
    si.write((bits - 1).toLong, 5)
    si.write(n.toLong, 36)
    val siBytes = si.toBytes
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(siBytes, 0, siBytes.length)
    out.write(signalMd5(channels, bits), 0, 16)

    var frameIdx = 0L
    var off = 0
    while (off < n) {
      val bs = math.min(blockSize, n - off)
      out.write(encodeFrame(channels, off, bs, frameIdx, bits))
      off += bs
      frameIdx += 1
    }
    out.toByteArray
  }

  /** UTF-8-style coded number: t bytes carry 5t+1 payload bits (t=2..6;
    * t=7 — lead byte 0xFE, six continuation bytes — carries the 36-bit
    * sample numbers variable-blocksize streams need, RFC 9639 §9.1.5). */
  private[functions] def codedNumber(w: BitWriter, v: Long): Unit =
    if (v < 0x80) w.write(v, 8)
    else {
      def payloadBits(t: Int): Int = if (t == 7) 36 else 5 * t + 1
      var t = 2
      while (t < 7 && v >= (1L << payloadBits(t))) t += 1
      val headTop = if (t == 7) 0L else (v >>> (6 * (t - 1))) & ((1L << (7 - t)) - 1)
      w.write((((0xFF << (8 - t)) & 0xFF).toLong | headTop), 8)
      var k = t - 2
      while (k >= 0) { w.write(0x80L | ((v >>> (6 * k)) & 0x3F), 8); k -= 1 }
    }

  /** Inverse of [[codedNumber]]: leading-ones count t of the lead byte
    * selects the width — t=0 is a bare 7-bit value, t=2..6 carries
    * `7−t` head bits + 6 per continuation byte, and t=7 (0xFE lead, zero
    * head payload, six continuation bytes) carries the 36-bit sample
    * numbers of variable-blocksize streams (RFC 9639 §9.1.5). t=1 (a
    * continuation byte in lead position) and t=8 (0xFF) are malformed. */
  private[functions] def readCodedNumber(r: BitReader): Long = {
    val first = r.read(8).toInt
    var extra = 0
    var f = first
    while ((f & 0x80) != 0) { extra += 1; f <<= 1 }
    if (extra == 1 || extra > 7) throw new IllegalArgumentException("coded number")
    var v: Long =
      if (extra == 0) first.toLong
      else first.toLong & ((1L << (7 - extra)) - 1)
    var i = 0
    while (i < math.max(0, extra - 1)) {
      val c = r.read(8).toInt
      if ((c & 0xC0) != 0x80) throw new IllegalArgumentException("cont byte")
      v = (v << 6) | (c & 0x3F)
      i += 1
    }
    v
  }

  private def fixedResidual(x: Array[Int], off: Int, bs: Int, order: Int): Array[Long] = {
    val r = new Array[Long](bs - order)
    var i = order
    while (i < bs) {
      val v = order match {
        case 0 => x(off + i).toLong
        case 1 => x(off + i).toLong - x(off + i - 1)
        case 2 => x(off + i).toLong - 2L * x(off + i - 1) + x(off + i - 2)
        case 3 => x(off + i).toLong - 3L * x(off + i - 1) + 3L * x(off + i - 2) - x(off + i - 3)
        case _ => x(off + i).toLong - 4L * x(off + i - 1) + 6L * x(off + i - 2) -
          4L * x(off + i - 3) + x(off + i - 4)
      }
      r(i - order) = v
      i += 1
    }
    r
  }

  private def bestRiceParam(res: Array[Long]): Int = {
    // deterministic: smallest k whose total bit cost is minimal (k ≤ 14)
    var bestK = 0; var bestCost = Long.MaxValue
    var k = 0
    while (k <= 14) {
      var cost = 0L
      var i = 0
      while (i < res.length) {
        val u = (res(i) << 1) ^ (res(i) >> 63)
        cost += (u >>> k) + 1 + k
        i += 1
      }
      if (cost < bestCost) { bestCost = cost; bestK = k }
      k += 1
    }
    bestK
  }

  private def encodeFrame(channels: Array[Array[Int]], off: Int, bs: Int,
                          frameIdx: Long, bits: Int): Array[Byte] = {
    // header (byte-aligned by construction: 14+1+1+4+4+4+3+1 = 32 bits,
    // whole coded-number bytes, then the 16-bit blocksize-1)
    val w = new BitWriter
    w.write(0x3FFEL, 14)     // sync
    w.write(0L, 1)           // mandatory zero
    w.write(0L, 1)           // fixed-blocksize stream
    w.write(7L, 4)           // block size: 16-bit value - 1 follows
    w.write(0L, 4)           // sample rate: from STREAMINFO
    w.write((channels.length - 1).toLong, 4) // independent channels
    w.write(bits match { case 8 => 1L; case _ => 4L }, 3)
    w.write(0L, 1)
    codedNumber(w, frameIdx)
    w.write((bs - 1).toLong, 16)
    val headerBytes = w.toBytes
    val whole = new java.io.ByteArrayOutputStream()
    whole.write(headerBytes, 0, headerBytes.length)
    whole.write(crc8(headerBytes, 0, headerBytes.length))
    val sw = new BitWriter
    var c = 0
    while (c < channels.length) {
      encodeSubframe(sw, channels(c), off, bs, bits)
      c += 1
    }
    sw.alignByte()
    val subBytes = sw.toBytes
    whole.write(subBytes, 0, subBytes.length)
    val frame = whole.toByteArray
    val fcrc = crc16(frame, 0, frame.length)
    val outB = new java.io.ByteArrayOutputStream()
    outB.write(frame, 0, frame.length)
    outB.write((fcrc >> 8) & 0xFF); outB.write(fcrc & 0xFF)
    outB.toByteArray
  }

  private def encodeSubframe(w: BitWriter, x: Array[Int], off: Int, bs: Int,
                             bits: Int): Unit = {
    // constant?
    var allSame = true
    var i = 1
    while (allSame && i < bs) { if (x(off + i) != x(off)) allSame = false; i += 1 }
    if (allSame) {
      w.write(0L, 1); w.write(0L, 6); w.write(0L, 1)
      w.write(x(off).toLong & ((1L << bits) - 1), bits)
      return
    }
    // pick the fixed order (0..2) with the smallest rice cost; fall back
    // to verbatim when rice would be larger (pathological signals)
    var bestOrder = 0; var bestCost = Long.MaxValue; var bestRes: Array[Long] = null; var bestK = 0
    var order = 0
    while (order <= 2) {
      if (bs > order) {
        val res = fixedResidual(x, off, bs, order)
        val k = bestRiceParam(res)
        var cost = order.toLong * bits + 2 + 4 + 4
        var j = 0
        while (j < res.length) {
          val u = (res(j) << 1) ^ (res(j) >> 63)
          cost += (u >>> k) + 1 + k
          j += 1
        }
        if (cost < bestCost) { bestCost = cost; bestOrder = order; bestRes = res; bestK = k }
      }
      order += 1
    }
    if (bestCost >= bs.toLong * bits) {
      // verbatim
      w.write(0L, 1); w.write(1L, 6); w.write(0L, 1)
      var j = 0
      while (j < bs) { w.write(x(off + j).toLong & ((1L << bits) - 1), bits); j += 1 }
      return
    }
    w.write(0L, 1); w.write((8 + bestOrder).toLong, 6); w.write(0L, 1)
    // warmup samples
    var j = 0
    while (j < bestOrder) { w.write(x(off + j).toLong & ((1L << bits) - 1), bits); j += 1 }
    // residual: rice method 0, partition order 0, one parameter
    w.write(0L, 2); w.write(0L, 4); w.write(bestK.toLong, 4)
    j = 0
    while (j < bestRes.length) {
      val u = (bestRes(j) << 1) ^ (bestRes(j) >> 63)
      w.writeUnary((u >>> bestK).toInt)
      if (bestK > 0) w.write(u & ((1L << bestK) - 1), bestK)
      j += 1
    }
  }

  // ------------------------------------------------------------ probe

  /** Oracle-facing roundtrip kernel: synthesize the deterministic mono
    * sawtooth `x(i) = ((seed·31 + i·step) mod 4096) − 2048`, encode it as
    * FLAC, decode THAT, verify sample-exact equality, and return the
    * decoded stream's metadata plus integer stats of the DECODED samples
    * (sum, min, max, Σ i·x — order-sensitive, so a permuted or shifted
    * decode cannot pass). Everything except `ok` is computable in SQL
    * from the closed form — the DuckDB oracle's gate on the decode. */
  def synthRoundtrip(seed: Long, n: Int, step: Int,
                     rate: Int): org.apache.spark.sql.catalyst.InternalRow = {
    require(n > 0 && step >= 0)
    val x = Array.tabulate(n)(i => (((seed * 31 + i.toLong * step) % 4096).toInt) - 2048)
    val dec = decodeFlac(encodeFlac(Array(x), rate, bits = 16, blockSize = 256))
    val ok = dec != null && dec.channels == 1 && dec.samples(0).sameElements(x)
    if (!ok)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](FlacFmt, -1, -1, -1, -1L, 0L, 0L, 0L, 0L, false))
    val s = dec.samples(0)
    var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue; var ws = 0L
    var i = 0
    while (i < s.length) {
      sum += s(i)
      if (s(i) < mn) mn = s(i)
      if (s(i) > mx) mx = s(i)
      ws += i.toLong * s(i)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      FlacFmt, dec.sampleRate, dec.channels, dec.bits, dec.totalSamples,
      sum, mn.toLong, mx.toLong, ws, true))
  }

  val FlacFmt: org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString("flac")

  // ----------------------------------------------------------- decode

  final case class FlacAudio(sampleRate: Int, channels: Int, bits: Int,
                             totalSamples: Long, samples: Array[Array[Int]])

  /** Full decode with every integrity check (CRC-8 per header, CRC-16
    * per frame, sample-count and MD5 vs STREAMINFO); null on any
    * structural or integrity failure. */
  def decodeFlac(b: Array[Byte]): FlacAudio =
    try decodeFlacOrThrow(b) catch { case _: Exception => null }

  private def decodeFlacOrThrow(b: Array[Byte]): FlacAudio = {
    if (b == null || b.length < 42) return null
    if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return null
    var pos = 4
    var sampleRate = -1; var nch = -1; var bits = -1; var total = -1L
    var md5: Array[Byte] = null
    var last = false
    var seenStreaminfo = false
    while (!last) {
      if (pos + 4 > b.length) return null
      val header = b(pos) & 0xFF
      last = (header & 0x80) != 0
      val btype = header & 0x7F
      val len = ((b(pos + 1) & 0xFF) << 16) | ((b(pos + 2) & 0xFF) << 8) | (b(pos + 3) & 0xFF)
      pos += 4
      if (pos + len > b.length) return null
      if (btype == 0) {
        if (len != 34) return null
        val r = new BitReader(b, pos)
        r.read(16); r.read(16); r.read(24); r.read(24)
        sampleRate = r.read(20).toInt
        nch = r.read(3).toInt + 1
        bits = r.read(5).toInt + 1
        total = r.read(36)
        md5 = java.util.Arrays.copyOfRange(b, pos + 18, pos + 34)
        seenStreaminfo = true
      }
      pos += len
    }
    if (!seenStreaminfo || sampleRate <= 0 || bits < 4) return null
    val out = Array.fill(nch)(new scala.collection.mutable.ArrayBuffer[Int]())
    while (pos < b.length) {
      pos = decodeFrame(b, pos, sampleRate, nch, bits, out)
    }
    val n = out(0).length.toLong
    if (total != 0 && n != total) return null
    if (out.exists(_.length.toLong != n)) return null
    val chans = out.map(_.toArray)
    if (md5 != null && !md5.forall(_ == 0) && bits % 8 == 0) {
      if (!java.util.Arrays.equals(signalMd5(chans, bits), md5)) return null
    }
    FlacAudio(sampleRate, nch, bits, n, chans)
  }

  private def decodeFrame(b: Array[Byte], start: Int, siRate: Int, siCh: Int,
                          siBits: Int,
                          out: Array[scala.collection.mutable.ArrayBuffer[Int]]): Int = {
    val r = new BitReader(b, start)
    if (r.read(14) != 0x3FFE) throw new IllegalArgumentException("bad sync")
    if (r.read(1) != 0) throw new IllegalArgumentException("reserved")
    r.read(1) // blocking strategy
    val bsBits = r.read(4).toInt
    val srBits = r.read(4).toInt
    val chAssign = r.read(4).toInt
    val ssBits = r.read(3).toInt
    if (r.read(1) != 0) throw new IllegalArgumentException("reserved2")
    // coded number (UTF-8 style)
    readCodedNumber(r)
    val blockSize = BlockSizeTable(bsBits) match {
      case -1 => throw new IllegalArgumentException("reserved blocksize")
      case -2 => r.read(8).toInt + 1
      case -3 => r.read(16).toInt + 1
      case v => v
    }
    SampleRateTable(srBits) match {
      case -2 => r.read(8)
      case -3 => r.read(16)
      case -4 => r.read(16)
      case -1 => throw new IllegalArgumentException("bad samplerate bits")
      case _ => ()
    }
    val bits = SampleSizeTable(ssBits) match {
      case 0 => siBits
      case -1 => throw new IllegalArgumentException("reserved samplesize")
      case v => v
    }
    if (chAssign > 10) throw new IllegalArgumentException(
      s"reserved channel assignment $chAssign") // 11-15 are reserved codes
    val nch = if (chAssign < 8) chAssign + 1 else 2
    if (nch != siCh) throw new IllegalArgumentException("channel mismatch")
    // header CRC-8 (covers sync..here, byte-aligned)
    if (!r.aligned) throw new IllegalArgumentException("header unaligned")
    val headerEnd = r.bytePos
    val expect8 = crc8(b, start, headerEnd)
    if ((r.read(8).toInt & 0xFF) != expect8) throw new IllegalArgumentException("crc8")
    // subframes
    val ch = new Array[Array[Long]](nch)
    var c = 0
    while (c < nch) {
      val extraBit = chAssign match {
        case 8 => if (c == 1) 1 else 0  // left/side
        case 9 => if (c == 0) 1 else 0  // right(side first)/... side/right: side is channel 0
        case 10 => if (c == 1) 1 else 0 // mid/side
        case _ => 0
      }
      ch(c) = decodeSubframe(r, blockSize, bits + extraBit)
      c += 1
    }
    r.alignByte()
    val frameEnd = r.bytePos
    val expect16 = crc16(b, start, frameEnd)
    val stored = ((b(frameEnd) & 0xFF) << 8) | (b(frameEnd + 1) & 0xFF)
    if (stored != expect16) throw new IllegalArgumentException("crc16")
    // stereo decorrelation
    val decoded: Array[Array[Long]] = chAssign match {
      case 8 => // left/side: right = left - side
        val l = ch(0); val s = ch(1)
        Array(l, Array.tabulate(blockSize)(i => l(i) - s(i)))
      case 9 => // side/right: left = right + side
        val s = ch(0); val rr = ch(1)
        Array(Array.tabulate(blockSize)(i => rr(i) + s(i)), rr)
      case 10 => // mid/side
        val m = ch(0); val s = ch(1)
        val l = Array.tabulate(blockSize) { i =>
          val mm = (m(i) << 1) | (s(i) & 1L); (mm + s(i)) >> 1
        }
        val rr = Array.tabulate(blockSize) { i =>
          val mm = (m(i) << 1) | (s(i) & 1L); (mm - s(i)) >> 1
        }
        Array(l, rr)
      case _ => ch
    }
    var cc = 0
    while (cc < nch) {
      var j = 0
      while (j < blockSize) { out(cc) += decoded(cc)(j).toInt; j += 1 }
      cc += 1
    }
    frameEnd + 2
  }

  private def decodeSubframe(r: BitReader, blockSize: Int, bits: Int): Array[Long] = {
    if (r.read(1) != 0) throw new IllegalArgumentException("subframe pad bit")
    val t = r.read(6).toInt
    var wasted = 0
    if (r.read(1) == 1) { wasted = r.readUnary() + 1 }
    val eff = bits - wasted
    val x = new Array[Long](blockSize)
    def signed(v: Long, w: Int): Long = (v << (64 - w)) >> (64 - w)
    if (t == 0) {
      val v = signed(r.read(eff), eff)
      java.util.Arrays.fill(x, v)
    } else if (t == 1) {
      var i = 0
      while (i < blockSize) { x(i) = signed(r.read(eff), eff); i += 1 }
    } else if (t >= 8 && t <= 12) {
      val order = t - 8
      var i = 0
      while (i < order) { x(i) = signed(r.read(eff), eff); i += 1 }
      val res = decodeResidual(r, blockSize, order)
      i = order
      while (i < blockSize) {
        val pred = order match {
          case 0 => 0L
          case 1 => x(i - 1)
          case 2 => 2L * x(i - 1) - x(i - 2)
          case 3 => 3L * x(i - 1) - 3L * x(i - 2) + x(i - 3)
          case _ => 4L * x(i - 1) - 6L * x(i - 2) + 4L * x(i - 3) - x(i - 4)
        }
        x(i) = pred + res(i - order)
        i += 1
      }
    } else throw new IllegalArgumentException(s"unsupported subframe type $t")
    if (wasted > 0) { var i = 0; while (i < blockSize) { x(i) = x(i) << wasted; i += 1 } }
    x
  }

  private def decodeResidual(r: BitReader, blockSize: Int, order: Int): Array[Long] = {
    val method = r.read(2).toInt
    if (method > 1) throw new IllegalArgumentException("reserved residual method")
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xF else 0x1F
    val partOrder = r.read(4).toInt
    val parts = 1 << partOrder
    if (blockSize % parts != 0) throw new IllegalArgumentException("partition size")
    val res = new Array[Long](blockSize - order)
    var idx = 0
    var p = 0
    while (p < parts) {
      val count = (blockSize >> partOrder) - (if (p == 0) order else 0)
      if (count < 0) throw new IllegalArgumentException("partition underflow")
      val param = r.read(pBits).toInt
      if (param == escape) {
        val raw = r.read(5).toInt
        var i = 0
        while (i < count) {
          res(idx) = if (raw == 0) 0L else (r.read(raw) << (64 - raw)) >> (64 - raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary().toLong
          val u = (q << param) | (if (param > 0) r.read(param) else 0L)
          res(idx) = (u >>> 1) ^ -(u & 1L)
          idx += 1; i += 1
        }
      }
      p += 1
    }
    res
  }
}
