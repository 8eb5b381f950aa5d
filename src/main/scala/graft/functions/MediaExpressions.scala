package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.{functions => F, graftbridge => bridge}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * C12 — REAL audio/video container codecs completing the multimodal
 * family next to [[ImageCodecUtil]]: byte-exact WAV (RIFF) and MP4
 * (ISO BMFF) encode plus chunk/box-walking metadata parsers, all as
 * codegen'd Catalyst expressions (no UDFs).
 *
 * The container structures follow the public specs — RIFF/WAVE
 * (Microsoft/IBM RIFF 1.0: little-endian chunk id+size stream,
 * word-aligned chunks, `fmt ` format descriptor, `data` payload) and
 * ISO 14496-12 boxes (big-endian size+fourcc, `ftyp` brand box,
 * `moov`/`mvhd` carrying timescale+duration). Neither format has a
 * checksum, so the oracle replays the ENTIRE byte stream hex-wise in
 * SQL — a stronger gate than PNG's CRC-limited prefix.
 *
 * The parsers do not trust fixed offsets: a variable-length `LIST/INFO`
 * chunk (WAV) and a variable-length `free` box (MP4) sit before the
 * metadata, so recovering it requires a genuine chunk/box walk — same
 * design as the JPEG COM-segment walk in [[ImageCodecUtil]]. Sample
 * payload decode stays out of scope (documented in
 * [[graft.operators.Multimodal]]); container geometry — sample rate,
 * channels, bit depth, timescale, duration, the fields a curation
 * pipeline filters on — is parsed for real.
 */
object MediaCodecUtil {
  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
  private def u64be(b: Array[Byte], i: Int): Long =
    (u32be(b, i) << 32) | u32be(b, i + 4)
  private def fourcc(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0).toByte && b(i + 1) == s.charAt(1).toByte &&
      b(i + 2) == s.charAt(2).toByte && b(i + 3) == s.charAt(3).toByte

  private def putTag(out: Array[Byte], i: Int, s: String): Unit = {
    var j = 0
    while (j < 4) { out(i + j) = s.charAt(j).toByte; j += 1 }
  }
  private def putU16le(out: Array[Byte], i: Int, v: Int): Unit = {
    out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
  }
  private def putU32le(out: Array[Byte], i: Int, v: Long): Unit = {
    out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
    out(i + 2) = (v >>> 16).toByte; out(i + 3) = (v >>> 24).toByte
  }
  private def putU32be(out: Array[Byte], i: Int, v: Long): Unit = {
    out(i) = (v >>> 24).toByte; out(i + 1) = (v >>> 16).toByte
    out(i + 2) = (v >>> 8).toByte; out(i + 3) = v.toByte
  }

  val WavFmt: UTF8String = UTF8String.fromString("wav")
  val Mp4Fmt: UTF8String = UTF8String.fromString("mp4")

  /** Structurally-complete PCM WAV: RIFF header, a variable-length
    * LIST/INFO/ICMT chunk of `pad` comment bytes BEFORE `fmt ` (forces
    * the parser to walk), canonical 16-byte `fmt `, and a `data` chunk
    * of `nSamples` zeroed frames. Odd-sized chunks get the RIFF
    * word-alignment pad byte. */
  def encodeWav(sampleRate: Int, channels: Int, bits: Int,
                nSamples: Int, pad: Int): Array[Byte] = {
    val p = math.max(0, pad)
    val p2 = p + (p & 1)
    val block = channels * (bits / 8)
    val dsize = nSamples.toLong * block
    val d2 = dsize + (dsize & 1)
    val listSize = 4 + 8 + p2 // "INFO" + ICMT header + padded comment
    val total = 12 + (8 + listSize) + 24 + 8 + d2
    val out = new Array[Byte](total.toInt)
    var i = 0
    putTag(out, i, "RIFF"); putU32le(out, i + 4, total - 8); putTag(out, i + 8, "WAVE")
    i += 12
    putTag(out, i, "LIST"); putU32le(out, i + 4, listSize); putTag(out, i + 8, "INFO")
    putTag(out, i + 12, "ICMT"); putU32le(out, i + 16, p)
    var j = 0
    while (j < p) { out(i + 20 + j) = 'x'; j += 1 } // alignment byte stays 0
    i += 8 + listSize
    putTag(out, i, "fmt "); putU32le(out, i + 4, 16)
    putU16le(out, i + 8, 1) // PCM
    putU16le(out, i + 10, channels)
    putU32le(out, i + 12, sampleRate.toLong)
    putU32le(out, i + 16, sampleRate.toLong * block)
    putU16le(out, i + 20, block)
    putU16le(out, i + 22, bits)
    i += 24
    putTag(out, i, "data"); putU32le(out, i + 4, dsize)
    out // zeroed PCM frames (+ alignment byte) are already in place
  }

  /** Structurally-valid minimal MP4: `ftyp` (isom major brand), a
    * variable-length `free` box (forces the box walk), and `moov`
    * containing a version-0 `mvhd` carrying timescale + duration. */
  def encodeMp4(timescale: Int, duration: Long, pad: Int): Array[Byte] = {
    val p = math.max(0, pad)
    val out = new Array[Byte](24 + (8 + p) + 8 + 108)
    var i = 0
    putU32be(out, i, 24); putTag(out, i + 4, "ftyp")
    putTag(out, i + 8, "isom"); putU32be(out, i + 12, 0x200)
    putTag(out, i + 16, "isom"); putTag(out, i + 20, "mp42")
    i += 24
    putU32be(out, i, 8L + p); putTag(out, i + 4, "free")
    i += 8 + p // free payload stays zeroed
    putU32be(out, i, 8 + 108); putTag(out, i + 4, "moov")
    i += 8
    putU32be(out, i, 108); putTag(out, i + 4, "mvhd")
    // version 0 + flags 0, ctime 0, mtime 0 already zeroed
    putU32be(out, i + 20, timescale.toLong)
    putU32be(out, i + 24, duration)
    putU32be(out, i + 28, 0x00010000L) // rate 1.0
    out(i + 32) = 0x01 // volume 1.0 (u16be 0x0100)
    // 2+8 reserved bytes stay zeroed
    putU32be(out, i + 44, 0x00010000L) // unity matrix
    putU32be(out, i + 60, 0x00010000L)
    putU32be(out, i + 76, 0x40000000L)
    // 24 pre_defined bytes stay zeroed
    putU32be(out, i + 104, 2) // next_track_ID
    out
  }

  /** Parse WAV metadata: struct(format, sample_rate, channels, bits,
    * n_samples), or null when the bytes are not a RIFF/WAVE stream with
    * a complete `fmt ` chunk. The chunk walk skips unknown chunks and
    * honors word alignment. */
  def parseWav(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (!fourcc(b, 0, "RIFF") || !fourcc(b, 8, "WAVE")) return null
    var i = 12
    var rate = -1L; var channels = -1; var bits = -1; var block = -1
    var dsize = -1L
    while (i + 8 <= b.length) {
      val size = u32le(b, i + 4)
      if (size < 0 || i + 8 + size > b.length) return null // truncated chunk
      if (fourcc(b, i, "fmt ")) {
        if (size < 16) return null
        channels = u16le(b, i + 10)
        rate = u32le(b, i + 12)
        block = u16le(b, i + 20)
        bits = u16le(b, i + 22)
      } else if (fourcc(b, i, "data")) {
        dsize = size
      }
      i += 8 + size.toInt + (size & 1).toInt
    }
    if (rate <= 0 || channels <= 0 || bits <= 0 || block <= 0 || dsize < 0) return null
    new GenericInternalRow(Array[Any](WavFmt, rate.toInt, channels, bits, dsize / block))
  }

  /** Parse MP4 metadata: struct(format, brand, timescale, duration), or
    * null when the bytes are not a leading-`ftyp` ISO BMFF stream with a
    * `moov`/`mvhd`. Handles mvhd versions 0 and 1; rejects desynchronized
    * or truncated box chains. */
  def parseMp4(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 16) return null
    if (u32be(b, 0) < 16 || !fourcc(b, 4, "ftyp")) return null
    val brand = UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, 8, 12))
    var i = 0
    while (i + 8 <= b.length) {
      val size = u32be(b, i)
      if (size == 1 || size < 8 || i + size > b.length) return null // 64-bit/invalid
      if (fourcc(b, i + 4, "moov")) {
        var j = i + 8
        val end = i + size
        while (j + 8 <= end) {
          val s2 = u32be(b, j)
          if (s2 < 8 || j + s2 > end) return null
          if (fourcc(b, j + 4, "mvhd")) {
            if (s2 < 12) return null
            val ver = b(j + 8) & 0xFF
            if (ver == 0 && s2 >= 32) {
              return new GenericInternalRow(Array[Any](
                Mp4Fmt, brand, u32be(b, j + 20).toInt, u32be(b, j + 24)))
            } else if (ver == 1 && s2 >= 44) {
              return new GenericInternalRow(Array[Any](
                Mp4Fmt, brand, u32be(b, j + 28).toInt, u64be(b, j + 32)))
            } else return null
          }
          j += s2.toInt
        }
        return null // moov without mvhd
      }
      i += size.toInt
    }
    null
  }
}

/** Encode struct<sample_rate:int, channels:int, bits:int, n_samples:int,
  * pad:int> → WAV container bytes. Codegen'd; byte assembly runs in the
  * static [[MediaCodecUtil]] kernel. */
case class AudioBytes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 5 && s.forall(_.dataType == IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires struct<int,int,int,int,int>, got $other")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "audio_bytes"

  override def nullSafeEval(input: Any): Any = {
    val r = input.asInstanceOf[InternalRow]
    MediaCodecUtil.encodeWav(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, row => s"""
      |${ev.value} = graft.functions.MediaCodecUtil.encodeWav(
      |  $row.getInt(0), $row.getInt(1), $row.getInt(2), $row.getInt(3), $row.getInt(4));
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): AudioBytes =
    copy(child = newChild)
}

/** Parse WAV bytes → struct(format, sample_rate, channels, bits,
  * n_samples); null for unrecognizable buffers. Codegen'd chunk walk. */
case class AudioMeta(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got $other")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType), StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType), StructField("bits", IntegerType),
    StructField("n_samples", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "audio_meta"

  override def nullSafeEval(input: Any): Any =
    MediaCodecUtil.parseWav(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => s"""
      |${ev.value} = graft.functions.MediaCodecUtil.parseWav($bytes);
      |${ev.isNull} = ${ev.value} == null;
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}

/** Encode struct<timescale:int, duration:long, pad:int> → MP4 container
  * bytes. Codegen'd via the static [[MediaCodecUtil]] kernel. */
case class VideoBytes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 3 && s(0).dataType == IntegerType &&
        s(1).dataType == LongType && s(2).dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires struct<int,bigint,int>, got $other")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "video_bytes"

  override def nullSafeEval(input: Any): Any = {
    val r = input.asInstanceOf[InternalRow]
    MediaCodecUtil.encodeMp4(r.getInt(0), r.getLong(1), r.getInt(2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, row => s"""
      |${ev.value} = graft.functions.MediaCodecUtil.encodeMp4(
      |  $row.getInt(0), $row.getLong(1), $row.getInt(2));
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): VideoBytes =
    copy(child = newChild)
}

/** Parse MP4 bytes → struct(format, brand, timescale, duration); null for
  * unrecognizable buffers. Codegen'd box walk. */
case class VideoMeta(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got $other")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType), StructField("brand", StringType),
    StructField("timescale", IntegerType), StructField("duration", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "video_meta"

  override def nullSafeEval(input: Any): Any =
    MediaCodecUtil.parseMp4(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => s"""
      |${ev.value} = graft.functions.MediaCodecUtil.parseMp4($bytes);
      |${ev.isNull} = ${ev.value} == null;
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): VideoMeta =
    copy(child = newChild)
}

/** Column-level entry points. */
object MediaFunctions {
  /** Synthesize WAV bytes from (sample_rate, channels, bits, n_samples,
    * pad) int columns. */
  def audioBytes(sampleRate: Column, channels: Column, bits: Column,
                 nSamples: Column, pad: Column): Column =
    bridge.column(AudioBytes(bridge.expression(
      F.struct(sampleRate.cast("int"), channels.cast("int"), bits.cast("int"),
        nSamples.cast("int"), pad.cast("int")))))

  /** Parse WAV bytes → struct(format, sample_rate, channels, bits, n_samples). */
  def audioMeta(bytes: Column): Column =
    bridge.column(AudioMeta(bridge.expression(bytes)))

  /** Synthesize MP4 bytes from (timescale, duration, pad) columns. */
  def videoBytes(timescale: Column, duration: Column, pad: Column): Column =
    bridge.column(VideoBytes(bridge.expression(
      F.struct(timescale.cast("int"), duration.cast("long"), pad.cast("int")))))

  /** Parse MP4 bytes → struct(format, brand, timescale, duration). */
  def videoMeta(bytes: Column): Column =
    bridge.column(VideoMeta(bridge.expression(bytes)))
}
