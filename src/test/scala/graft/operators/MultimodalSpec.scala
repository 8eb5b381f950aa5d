package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** C12 — multimodal plumbing: schema, deterministic (stubbed) decode,
  * metadata ops, frame-sampling expansion. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val media = Multimodal.asMediaTable(docs)

  test("media table has the binary + typed-metadata schema") {
    val sch = media.schema
    assert(sch("media").dataType == BinaryType)
    assert(Seq("media_id", "kind", "width", "height", "duration_ms").forall(sch.fieldNames.contains))
    val kinds = media.select("kind").distinct().as[String].collect().toSet
    assert(kinds.subsetOf(Set("image", "audio", "video")))
    assert(media.filter(col("width") < 1 || col("height") < 1).count() == 0)
  }

  test("feature extraction is deterministic with the contract dim") {
    val f1 = Multimodal.extractFeatures(media, batchSize = 32).collect()
      .map(r => r.media_id -> r.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7), batchSize = 8).collect()
      .map(r => r.media_id -> r.features.toSeq).toMap
    assert(f1.keySet == f2.keySet && f1.keySet.size == docs.count())
    assert(f1.values.forall(_.size == Multimodal.FeatureDim))
    assert(f1 == f2, "features must not depend on partitioning or batch size")
  }

  test("metadata resize preserves aspect and respects maxDim") {
    val resized = Multimodal.resizeMeta(media, maxDim = 256)
      .select("width", "height", "out_width", "out_height")
      .as[(Int, Int, Int, Int)].collect()
    resized.foreach { case (w, h, ow, oh) =>
      assert(ow <= 257 && oh <= 257) // ceil rounding tolerance
      assert(ow <= w && oh <= h, "never upscale")
      if (w > 256 || h > 256) assert(math.max(ow, oh) >= 256, "long edge lands on maxDim")
    }
  }

  test("frame sampling emits one row per sampled timestamp, video only") {
    val frames = Multimodal.sampleFrames(media, everyMs = 60000)
    assert(frames.select("kind").distinct().as[String].collect().toSeq == Seq("video"))
    val one = media.filter(col("kind") === "video").select("media_id", "duration_ms")
      .as[(Long, Long)].head()
    val n = frames.filter(col("media_id") === one._1).count()
    assert(n == one._2 / 60000 + 1)
  }

  test("image codec round-trips: encoded containers parse back to their geometry") {
    val enc = Multimodal.encodedMediaTable(docs)
    val back = enc.select(col("media_id"), col("kind"),
        Multimodal.decodeMeta(col("media")).as("m"))
      .select($"media_id", $"kind", $"m.format", $"m.width", $"m.height", $"m.depth")
      .as[(Long, String, String, Int, Int, Int)].collect()
    assert(back.length == docs.count())
    back.foreach { case (id, kind, fmt, w, h, d) =>
      assert(fmt == kind, s"media $id: format $fmt != kind $kind")
      assert(w >= 1 && w <= 1900 && h >= 1 && h <= 1060, s"media $id: bad geometry $w x $h")
      assert(if (fmt == "png") d == 8 || d == 16 else d == 8, s"media $id: depth $d")
    }
  }

  test("image parser handles golden vectors and rejects corrupt buffers") {
    import graft.functions.ImageCodecUtil
    // golden: the canonical 1x1 transparent PNG header bytes
    val png1x1 = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0x00, 0x00, 0x00, 0x0D, 'I', 'H', 'D', 'R',
      0, 0, 0, 1, 0, 0, 0, 1, 8, 6, 0, 0, 0, 0x1F, 0x15, 0xC4, 0x89).map(_.toByte)
    val m = ImageCodecUtil.parse(png1x1)
    assert(m != null && m.getInt(1) == 1 && m.getInt(2) == 1 && m.getInt(3) == 8)
    // marker walk must skip fill bytes and RSTn and still find SOF0
    val jpeg = ImageCodecUtil.encodeJpeg(640, 480, 8, pad = 5)
    val jm = ImageCodecUtil.parse(jpeg)
    assert(jm.getString(0) == "jpeg" && jm.getInt(1) == 640 && jm.getInt(2) == 480)
    val gif = ImageCodecUtil.parse(ImageCodecUtil.encodeGif(320, 200, 5))
    assert(gif.getString(0) == "gif" && gif.getInt(1) == 320 &&
      gif.getInt(2) == 200 && gif.getInt(3) == 5)
    // corrupt/truncated/alien buffers → null, never a wrong answer
    assert(ImageCodecUtil.parse(Array[Byte]()) == null)
    assert(ImageCodecUtil.parse("not an image at all".getBytes) == null)
    assert(ImageCodecUtil.parse(png1x1.take(20)) == null)
    assert(ImageCodecUtil.parse(jpeg.take(10)) == null)
    val desync = jpeg.clone(); desync(2) = 0x00 // break the marker chain
    assert(ImageCodecUtil.parse(desync) == null)
  }

  test("encoded containers are readable by the JDK's own ImageIO header readers") {
    import graft.functions.ImageCodecUtil
    // independent decoder cross-check: javax.imageio ships PNG/JPEG
    // readers in the JDK — they must agree with our parser on geometry
    // (the JDK GIF reader reports the IMAGE descriptor's size, which a
    // header-only stream doesn't carry, so GIF is golden-vector-gated)
    for ((bytes, w, h) <- Seq(
        (ImageCodecUtil.encodePng(123, 45, 8), 123, 45),
        (ImageCodecUtil.encodeJpeg(1279, 721, 8, pad = 11), 1279, 721))) {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      assert(readers.hasNext, "JDK must recognize the container")
      val r = readers.next()
      r.setInput(in)
      assert(r.getWidth(0) == w && r.getHeight(0) == h,
        s"${r.getFormatName}: JDK read ${r.getWidth(0)}x${r.getHeight(0)}, expected ${w}x$h")
      r.dispose(); in.close()
    }
  }

  test("audio codec round-trips: WAV containers chunk-walk back to their geometry") {
    val enc = Multimodal.encodedAudioTable(docs)
    val back = enc.select(col("media_id"), Multimodal.decodeAudioMeta(col("media")).as("m"))
      .select($"media_id", $"m.format", $"m.sample_rate", $"m.channels", $"m.bits", $"m.n_samples")
      .as[(Long, String, Int, Int, Int, Long)].collect()
    assert(back.length == docs.count())
    back.foreach { case (id, fmt, rate, ch, bits, n) =>
      assert(fmt == "wav", s"media $id")
      assert(Set(8000, 16000, 22050, 44100, 48000)(rate), s"media $id: rate $rate")
      assert(ch == (id % 2 + 1) && bits == ((id % 3 + 1) * 8).toInt, s"media $id")
      assert(n >= 1 && n <= 480, s"media $id: n_samples $n")
    }
  }

  test("video codec round-trips: MP4 containers box-walk back to their metadata") {
    val enc = Multimodal.encodedVideoTable(docs)
    val back = enc.select(col("media_id"), Multimodal.decodeVideoMeta(col("media")).as("m"))
      .select($"media_id", $"m.format", $"m.brand", $"m.timescale", $"m.duration")
      .as[(Long, String, String, Int, Long)].collect()
    assert(back.length == docs.count())
    back.foreach { case (id, fmt, brand, ts, dur) =>
      assert(fmt == "mp4" && brand == "isom", s"media $id")
      assert(Set(600, 1000, 24000, 30000, 90000)(ts), s"media $id: timescale $ts")
      assert(dur >= 1 && dur <= 600000, s"media $id: duration $dur")
    }
  }

  test("audio/video parsers handle golden vectors, mvhd v1, and reject corrupt buffers") {
    import graft.functions.MediaCodecUtil
    // WAV round-trip incl. odd comment + odd data sizes (alignment pads)
    val wav = MediaCodecUtil.encodeWav(44100, 1, 8, 101, pad = 3)
    val wm = MediaCodecUtil.parseWav(wav)
    assert(wm.getString(0) == "wav" && wm.getInt(1) == 44100 && wm.getInt(2) == 1 &&
      wm.getInt(3) == 8 && wm.getLong(4) == 101L)
    // MP4 v0 round-trip
    val mp4 = MediaCodecUtil.encodeMp4(90000, 123456L, pad = 7)
    val vm = MediaCodecUtil.parseMp4(mp4)
    assert(vm.getString(0) == "mp4" && vm.getString(1) == "isom" &&
      vm.getInt(2) == 90000 && vm.getLong(3) == 123456L)
    // hand-built mvhd VERSION 1 (64-bit times) — parser must honor the
    // wider layout even though our encoder emits v0
    val v1 = mp4.clone()
    val moovOff = 24 + 8 + 7
    val mvhdOff = moovOff + 8
    // grow mvhd v0 (108) -> v1 (120): rebuild moov with a v1 mvhd
    val v1mvhd = new Array[Byte](120)
    v1mvhd(3) = 120; v1mvhd(4) = 'm'; v1mvhd(5) = 'v'; v1mvhd(6) = 'h'; v1mvhd(7) = 'd'
    v1mvhd(8) = 1 // version
    v1mvhd(31) = 0x3C // timescale u32be @28 = 60
    v1mvhd(38) = 0x01; v1mvhd(39) = 0x00 // duration u64be @32 = 256
    val head = v1.take(mvhdOff)
    head(moovOff + 3) = (8 + 120).toByte // moov size
    val golden = head ++ v1mvhd
    val gm = MediaCodecUtil.parseMp4(golden)
    assert(gm != null && gm.getInt(2) == 60 && gm.getLong(3) == 256L,
      s"mvhd v1 parse: $gm")
    // corrupt/truncated/alien buffers → null, never a wrong answer
    assert(MediaCodecUtil.parseWav(Array[Byte]()) == null)
    assert(MediaCodecUtil.parseWav("RIFFxxxxWAVEbroken".getBytes) == null)
    assert(MediaCodecUtil.parseWav(wav.take(30)) == null) // truncated chunk
    assert(MediaCodecUtil.parseMp4(wav) == null)
    assert(MediaCodecUtil.parseWav(mp4) == null)
    assert(MediaCodecUtil.parseMp4(mp4.take(40)) == null) // truncated moov
    val desync = mp4.clone(); desync(0) = 0x7F // oversized leading box
    assert(MediaCodecUtil.parseMp4(desync) == null)
  }

  test("ADTS codec: frame walk round-trips, honors CRC headers, rdb counts; rejects corrupt streams") {
    import graft.functions.MediaCodecUtil
    // round-trip incl. the 13-bit frame_length split across three bytes
    // (payload 5000 → frame_length 5007 sets the two high bits in byte 3)
    for ((sfi, ch, frames, plen) <- Seq((3, 2, 4, 0), (11, 1, 1, 49), (4, 3, 7, 5000))) {
      val b = MediaCodecUtil.encodeAdts(sfi, ch, frames, plen)
      val m = MediaCodecUtil.parseAdts(b)
      assert(m != null, s"sfi=$sfi")
      assert(m.getString(0) == "aac-adts" && m.getInt(1) == MediaCodecUtil.AdtsRates(sfi) &&
        m.getInt(2) == ch && m.getInt(3) == 2 && m.getLong(4) == frames.toLong &&
        m.getLong(5) == frames * 1024L, s"sfi=$sfi ch=$ch frames=$frames plen=$plen: $m")
    }
    // protection_absent=0: the header grows to 9 bytes (2-byte CRC) and the
    // frame_length covers it — hand-built, since our encoder emits CRC-free
    val prot = MediaCodecUtil.encodeAdts(5, 2, 1, 3).clone()
    val withCrc = new Array[Byte](12) // 9-byte header + 1 payload + pad to len
    System.arraycopy(prot, 0, withCrc, 0, 7)
    withCrc(1) = 0xF0.toByte // protection_absent=0
    val flen = 12
    withCrc(3) = (((2 & 3) << 6) | ((flen >> 11) & 3)).toByte
    withCrc(4) = ((flen >> 3) & 0xFF).toByte
    withCrc(5) = (((flen & 7) << 5) | 0x1F).toByte
    val pm = MediaCodecUtil.parseAdts(withCrc)
    assert(pm != null && pm.getLong(4) == 1L && pm.getLong(5) == 1024L, s"crc-header frame: $pm")
    // number_of_raw_data_blocks_in_frame: rdb-1=1 → 2048 samples per frame
    val rdb = MediaCodecUtil.encodeAdts(3, 1, 2, 4).clone()
    rdb(6) = 0xFD.toByte; rdb(11 + 6) = 0xFD.toByte
    val rm = MediaCodecUtil.parseAdts(rdb)
    assert(rm.getLong(4) == 2L && rm.getLong(5) == 4096L, s"rdb frames: $rm")
    // corruption → null, never a wrong answer: truncation, desync, and a
    // mid-stream config change (one stream, one config)
    val ok = MediaCodecUtil.encodeAdts(6, 2, 3, 10)
    assert(MediaCodecUtil.parseAdts(Array[Byte]()) == null)
    assert(MediaCodecUtil.parseAdts(ok.take(20)) == null)
    val bad = ok.clone(); bad(0) = 0x00
    assert(MediaCodecUtil.parseAdts(bad) == null)
    val mixed = ok.clone()
    mixed(17 + 2) = ((1 << 6) | (7 << 2)).toByte // second frame: different sfi
    assert(MediaCodecUtil.parseAdts(mixed) == null)
  }

  test("Ogg Vorbis container: page walk verifies real RFC 3533 CRCs; identification header parses") {
    import graft.functions.MediaCodecUtil
    for ((ch, rate, total, plen, serial) <- Seq(
      (1, 8000, 1L, 1, 0), (2, 48000, 1234567L, 254, 99999),
      (2, 44100, 7L, 255, 7), (1, 22050, 1L << 33, 510, 42))) {
      val b = MediaCodecUtil.encodeOggVorbis(ch, rate, total, plen, serial)
      val m = MediaCodecUtil.parseOggVorbis(b)
      assert(m != null, s"rate=$rate plen=$plen")
      assert(m.getString(0) == "ogg-vorbis" && m.getInt(1) == rate && m.getInt(2) == ch &&
        m.getLong(3) == 2L && m.getLong(4) == total && m.getLong(5) == serial.toLong,
        s"ch=$ch rate=$rate total=$total plen=$plen serial=$serial: $m")
    }
    // the CRC kernel IS the RFC 3533 one: compare the table-driven kernel
    // against an independent bit-serial implementation (poly 0x04C11DB7,
    // init 0, MSB-first, no reflection, no final xor) on random buffers
    def bitSerial(bytes: Array[Byte]): Int = {
      var crc = 0
      bytes.foreach { byte =>
        crc ^= (byte & 0xFF) << 24
        var k = 0
        while (k < 8) {
          crc = if ((crc & 0x80000000) != 0) (crc << 1) ^ 0x04C11DB7 else crc << 1
          k += 1
        }
      }
      crc
    }
    val rnd = new scala.util.Random(42)
    for (len <- Seq(0, 1, 7, 64, 300)) {
      val buf = Array.fill[Byte](len)(rnd.nextInt().toByte)
      assert(MediaCodecUtil.oggCrc(buf, 0, len, -1, -1) == bitSerial(buf), s"len=$len")
    }
    // ANY single-byte corruption of a page body fails its checksum → null
    val good = MediaCodecUtil.encodeOggVorbis(2, 44100, 1000L, 40, 5)
    for (off <- Seq(5, 12, 30, good.length - 3)) {
      val bad = good.clone(); bad(off) = (bad(off) ^ 0x01).toByte
      assert(MediaCodecUtil.parseOggVorbis(bad) == null, s"corrupt@$off must fail CRC")
    }
    // structural rejections: truncation, alien bytes, serial change mid-stream
    assert(MediaCodecUtil.parseOggVorbis(good.take(40)) == null)
    assert(MediaCodecUtil.parseOggVorbis("not an ogg stream at all....".getBytes) == null)
    // a multiple-of-255 packet needs the 0 lacing terminator: page sizing
    // must account for it (covered by the 255/510 round-trips above); and
    // a non-vorbis first packet is rejected even with a valid CRC
    val wavFirst = MediaCodecUtil.encodeOggVorbis(2, 44100, 10L, 10, 1)
    // overwrite the id packet type then re-CRC the first page so only the
    // vorbis check can reject it
    val nseg0 = wavFirst(26) & 0xFF
    val page0Len = {
      var body = 0; var s = 0
      while (s < nseg0) { body += wavFirst(27 + s) & 0xFF; s += 1 }
      27 + nseg0 + body
    }
    val alien = wavFirst.clone()
    alien(27 + nseg0) = 0x03 // not an identification header
    val crc = MediaCodecUtil.oggCrc(alien, 0, page0Len, 22, 26)
    alien(22) = crc.toByte; alien(23) = (crc >>> 8).toByte
    alien(24) = (crc >>> 16).toByte; alien(25) = (crc >>> 24).toByte
    assert(MediaCodecUtil.parseOggVorbis(alien) == null)
  }

  test("encoded WAV is readable by the JDK's own javax.sound parser") {
    import graft.functions.MediaCodecUtil
    // independent decoder cross-check: the JDK ships a RIFF/WAVE reader
    val bytes = MediaCodecUtil.encodeWav(22050, 2, 16, 250, pad = 5)
    val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(bytes))
    assert(fmt.getType == javax.sound.sampled.AudioFileFormat.Type.WAVE)
    val af = fmt.getFormat
    assert(af.getSampleRate == 22050f && af.getChannels == 2 &&
      af.getSampleSizeInBits == 16,
      s"JDK read ${af.getSampleRate}/${af.getChannels}ch/${af.getSampleSizeInBits}bit")
    assert(fmt.getFrameLength == 250, s"JDK frame length ${fmt.getFrameLength}")
  }

  test("PNG pixel decode is exact: our decoder, our encoder and ImageIO all agree") {
    import graft.functions.PixelCodecUtil
    val w = 23; val h = 17 // odd sizes; filters cycle 0-4 across 17 rows
    def pix(x: Int, y: Int): Int =
      (scala.util.hashing.MurmurHash3.productHash((x, y, 42)) | 0xFF)
    val bytes = PixelCodecUtil.encodePngPixels(w, h, pix)
    // our decoder returns the exact pixels we fed the encoder
    val ours = PixelCodecUtil.decodePngPixels(bytes)
    assert(ours != null && ours.length == w * h)
    for (y <- 0 until h; x <- 0 until w)
      assert(ours(y * w + x) == pix(x, y), s"pixel ($x, $y)")
    // the JDK's independent PNG decoder agrees pixel-for-pixel
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = pix(x, y) // packed RGBA -> ImageIO's packed ARGB
      val argb = ((p & 0xFF) << 24) | (p >>> 8)
      assert(img.getRGB(x, y) == argb, s"ImageIO pixel ($x, $y)")
    }
    // corrupt zlib stream → null, not garbage pixels
    val broken = bytes.clone()
    broken(bytes.length - 20) = (broken(bytes.length - 20) ^ 0x55).toByte
    // (flip a byte inside IDAT; CRC isn't checked but inflate desyncs or
    // pixels change — either way decode must not throw)
    PixelCodecUtil.decodePngPixels(broken) // no exception
    assert(PixelCodecUtil.decodePngPixels("not a png".getBytes) == null)
  }

  test("GIF pixel decode is exact: our LZW decoder, our encoder and ImageIO all agree") {
    import graft.functions.PixelCodecUtil
    val w = 23; val h = 17
    val palette = Array.tabulate(64)(c =>
      scala.util.hashing.MurmurHash3.productHash((c, 9)) & 0xFFFFFF)
    def idx(x: Int, y: Int): Int =
      java.lang.Math.floorMod(
        scala.util.hashing.MurmurHash3.productHash((x, y, 7)), palette.length)
    val bytes = PixelCodecUtil.encodeGifPixels(w, h, palette, idx)
    // our decoder returns the exact palette colours we fed the encoder
    val ours = PixelCodecUtil.decodeGifPixels(bytes)
    assert(ours != null && ours.length == w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = palette(idx(x, y))
      val want = (((rgb >> 16) & 0xFF) << 24) | (((rgb >> 8) & 0xFF) << 16) |
        ((rgb & 0xFF) << 8) | 0xFF
      assert(ours(y * w + x) == want, s"pixel ($x, $y)")
    }
    // the JDK's independent GIF decoder agrees pixel-for-pixel
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = palette(idx(x, y))
      assert((img.getRGB(x, y) & 0xFFFFFF) == rgb, s"ImageIO pixel ($x, $y)")
    }
    assert(PixelCodecUtil.decodeGifPixels("not a gif".getBytes) == null)
  }

  test("GIF LZW survives dictionary growth, capacity clears and run-heavy input") {
    import graft.functions.PixelCodecUtil
    // 128x96 noise at 256 colours: >4096 distinct sequences force code
    // widths through 12 bits and at least one capacity clear
    val palette = Array.tabulate(256)(c => (c * 0x010307) & 0xFFFFFF)
    def noise(x: Int, y: Int): Int =
      java.lang.Math.floorMod(
        scala.util.hashing.MurmurHash3.productHash((x, y, 13)), 256)
    val big = PixelCodecUtil.encodeGifPixels(128, 96, palette, noise)
    val dec = PixelCodecUtil.decodeGifPixels(big)
    assert(dec != null && dec.length == 128 * 96)
    val imgB = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(big))
    for (y <- 0 until 96; x <- 0 until 128) {
      val rgb = palette(noise(x, y))
      assert((imgB.getRGB(x, y) & 0xFFFFFF) == rgb, s"ImageIO pixel ($x, $y)")
      val want = (((rgb >> 16) & 0xFF) << 24) | (((rgb >> 8) & 0xFF) << 16) |
        ((rgb & 0xFF) << 8) | 0xFF
      assert(dec(y * 128 + x) == want, s"our pixel ($x, $y)")
    }
    // long constant runs exercise the KwKwK (code == next) decode path
    val flat = PixelCodecUtil.encodeGifPixels(64, 8, Array(0xFF0000, 0x00FF00),
      (_, _) => 0)
    val fd = PixelCodecUtil.decodeGifPixels(flat)
    assert(fd != null && fd.forall(_ == 0xFF0000FF))
    val imgF = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(flat))
    assert((0 until 8).forall(y => (0 until 64).forall(x =>
      (imgF.getRGB(x, y) & 0xFFFFFF) == 0xFF0000)))
    // tiny palettes hit the 2-bit minimum code size rule
    val tiny = PixelCodecUtil.encodeGifPixels(5, 3, Array(0x123456),
      (_, _) => 0)
    assert(PixelCodecUtil.decodeGifPixels(tiny).forall(_ == 0x123456FF))
  }

  test("GIF LZW round-trips 15 seeded random images exactly (sizes, palettes, patterns vary)") {
    import graft.functions.PixelCodecUtil
    for (seed <- 1 to 15) {
      val rnd = new scala.util.Random(seed)
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(30)
      val nCol = 1 + rnd.nextInt(256)
      val palette = Array.fill(nCol)(rnd.nextInt(1 << 24))
      // mix of noise and runs: runs stress KwKwK, noise stresses growth
      val runBias = rnd.nextInt(4) // 0 = pure noise … 3 = long runs
      val idx = Array.tabulate(h, w) { (y, x) =>
        if (runBias > 0 && (x % (runBias * 5 + 1)) != 0 && x > 0) -1 else rnd.nextInt(nCol)
      }
      for (y <- 0 until h; x <- 0 until w) if (idx(y)(x) < 0) idx(y)(x) = idx(y)(x - 1)
      val bytes = PixelCodecUtil.encodeGifPixels(w, h, palette, (x, y) => idx(y)(x))
      val dec = PixelCodecUtil.decodeGifPixels(bytes)
      assert(dec != null && dec.length == w * h, s"seed $seed ($w x $h, $nCol colours)")
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = palette(idx(y)(x))
        val want = (((rgb >> 16) & 0xFF) << 24) | (((rgb >> 8) & 0xFF) << 16) |
          ((rgb & 0xFF) << 8) | 0xFF
        assert(dec(y * w + x) == want, s"seed $seed pixel ($x, $y)")
      }
    }
  }

  test("JPEG baseline codec: our encode→decode agrees with ImageIO within the T.81 IDCT tolerance") {
    import graft.functions.JpegCodecUtil
    val w = 40; val h = 24
    def pix(x: Int, y: Int): Int = {
      val r = (x * 255 / (w - 1)) & 0xFF
      val g = (y * 255 / (h - 1)) & 0xFF
      val b = ((x + y) * 255 / (w + h - 2)) & 0xFF
      (r << 16) | (g << 8) | b
    }
    val bytes = JpegCodecUtil.encodeJpegPixels(w, h, 85, pix)
    val ours = JpegCodecUtil.decodeJpegPixels(bytes)
    assert(ours != null && ours.length == w * h)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == w && img.getHeight == h,
      "the JDK's reader must accept our baseline stream")
    var maxJdk = 0; var maxSrc = 0
    for (y <- 0 until h; x <- 0 until w) {
      val o = ours(y * w + x); val j = img.getRGB(x, y); val s = pix(x, y)
      def chans(rgb24: Int) = Seq((rgb24 >> 16) & 0xFF, (rgb24 >> 8) & 0xFF, rgb24 & 0xFF)
      val oc = Seq((o >>> 24) & 0xFF, (o >>> 16) & 0xFF, (o >>> 8) & 0xFF)
      maxJdk = math.max(maxJdk, oc.zip(chans(j & 0xFFFFFF)).map(p => math.abs(p._1 - p._2)).max)
      maxSrc = math.max(maxSrc, oc.zip(chans(s)).map(p => math.abs(p._1 - p._2)).max)
    }
    // T.81 permits small IDCT variance between conformant decoders
    assert(maxJdk <= 2, s"our decode vs ImageIO: max channel diff $maxJdk")
    // quality-85 smooth gradient: quantization loss stays small
    assert(maxSrc <= 8, s"our decode vs source: max channel diff $maxSrc")
  }

  test("JPEG decoder handles foreign streams: ImageIO-written gray and 4:2:0 color") {
    import graft.functions.JpegCodecUtil
    import java.awt.image.BufferedImage
    val w = 32; val h = 20
    // grayscale: single component, no chroma upsampling — tight agreement
    val gray = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) // raster samples: no color management
      gray.getRaster.setSample(x, y, 0, (x * 8 + y * 3) & 0xFF)
    val gb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gray, "jpeg", gb)
    val og = JpegCodecUtil.decodeJpegPixels(gb.toByteArray)
    val jg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gb.toByteArray))
    assert(og != null, "must decode a JDK-written grayscale JPEG")
    val maxG = (for (y <- 0 until h; x <- 0 until w) yield
      math.abs(((og(y * w + x) >>> 24) & 0xFF) - jg.getRaster.getSample(x, y, 0))).max
    assert(maxG <= 2, s"gray: max diff vs ImageIO $maxG")
    // color: the JDK writes 4:2:0; we implement libjpeg's own fancy
    // (triangle) upsampling with its rounding constants, so agreement is
    // within IDCT + fixed-point color-conversion variance
    val col = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      col.setRGB(x, y, ((x * 255 / (w - 1)) << 16) | ((y * 255 / (h - 1)) << 8) | 0x40)
    val cb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(col, "jpeg", cb)
    val oc = JpegCodecUtil.decodeJpegPixels(cb.toByteArray)
    val jc = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cb.toByteArray))
    assert(oc != null, "must decode a JDK-written 4:2:0 color JPEG")
    val diffs = for (y <- 0 until h; x <- 0 until w) yield {
      val o = oc(y * w + x); val j = jc.getRGB(x, y)
      Seq(math.abs(((o >>> 24) & 0xFF) - ((j >> 16) & 0xFF)),
        math.abs(((o >>> 16) & 0xFF) - ((j >> 8) & 0xFF)),
        math.abs(((o >>> 8) & 0xFF) - (j & 0xFF))).max
    }
    assert(diffs.max <= 6, s"4:2:0: max diff ${diffs.max}")
    assert(diffs.sum.toDouble / diffs.size <= 1.0, s"4:2:0: mean diff ${diffs.sum.toDouble / diffs.size}")
    // progressive streams are rejected with null, never garbage
    val pw = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val pp = pw.getDefaultWriteParam
    pp.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val pb = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(pb)
    pw.setOutput(ios)
    pw.write(null, new javax.imageio.IIOImage(col, null, null), pp)
    ios.close(); pw.dispose()
    assert(JpegCodecUtil.decodeJpegPixels(pb.toByteArray) == null,
      "progressive must be rejected, not misdecoded")
    // truncation must not throw
    JpegCodecUtil.decodeJpegPixels(gb.toByteArray.take(gb.size() / 2))
    assert(JpegCodecUtil.decodeJpegPixels("not a jpeg".getBytes) == null)
  }

  test("WAV PCM decode is exact both ways: JDK-written audio decodes back; our WAV plays in the JDK") {
    import graft.functions.{MediaCodecUtil, PixelCodecUtil}
    import javax.sound.sampled._
    // direction 1: the JDK writes a 16-bit PCM WAV; our decoder must
    // recover the exact samples
    val samples = Array.tabulate(300)(i =>
      (math.sin(i * 0.1) * 12000).toInt + (i % 7) - 3)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = s.toByte; pcm(2 * i + 1) = (s >> 8).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length),
      AudioFileFormat.Type.WAVE, out)
    val decoded = PixelCodecUtil.decodeWavSamples(out.toByteArray)
    assert(decoded != null && decoded.toSeq == samples.toSeq,
      "JDK-written PCM must decode value-exactly")
    // direction 2: our PCM-filled WAV reads back identically through the
    // JDK's AudioSystem
    val ours = PixelCodecUtil.encodeWavSamples(16000, 2, 16, samples, pad = 5)
    assert(PixelCodecUtil.decodeWavSamples(ours).toSeq == samples.toSeq)
    val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(ours))
    val jdkBytes = in.readAllBytes()
    assert(jdkBytes.length == samples.length * 2)
    samples.indices.foreach { i =>
      val v = ((jdkBytes(2 * i) & 0xFF) | (jdkBytes(2 * i + 1) << 8)).toShort.toInt
      assert(v == samples(i), s"sample $i: JDK read $v, wrote ${samples(i)}")
    }
    // 8-bit and 24-bit depths round-trip through our own pair
    val s8 = Array.tabulate(40)(i => i - 20)
    assert(PixelCodecUtil.decodeWavSamples(
      PixelCodecUtil.encodeWavSamples(8000, 1, 8, s8)).toSeq == s8.toSeq)
    val s24 = Array.tabulate(40)(i => i * 100000 - 2000000)
    assert(PixelCodecUtil.decodeWavSamples(
      PixelCodecUtil.encodeWavSamples(48000, 1, 24, s24)).toSeq == s24.toSeq)
    // header-only encodeWav zeroes: 8-bit zero byte decodes to -128
    val z = PixelCodecUtil.decodeWavSamples(MediaCodecUtil.encodeWav(8000, 1, 8, 4, 0))
    assert(z.toSeq == Seq(-128, -128, -128, -128))
  }

  test("MP4 PCM tracks: full box tree round-trips exactly; stco points at the real mdat") {
    import graft.functions.{MediaCodecUtil, PixelCodecUtil}
    val samples = Array.tabulate(600)(i => (math.sin(i * 0.05) * 18000).toInt + (i % 5) - 2)
    val bytes = PixelCodecUtil.encodeMp4PcmSamples(16000, 2, samples)
    // sample-exact round trip through the real stsd/stsz/stsc/stco walk
    val dec = PixelCodecUtil.decodeMp4PcmSamples(bytes)
    assert(dec != null && dec.samples.toSeq == samples.toSeq)
    assert(dec.channels == 2 && dec.bits == 16 && dec.sampleRate == 16000)
    // the container-level meta walk (q132's parser) accepts the file
    val meta = MediaCodecUtil.parseMp4(bytes)
    assert(meta != null && meta.getInt(2) == 16000 && meta.getLong(3) == 300,
      "mvhd timescale/duration must read back through the q132 box walk")
    // structural honesty: the stco offset equals the actual mdat payload
    // position found by independently scanning the top-level boxes
    def u32(i: Int): Long = ((bytes(i) & 0xFFL) << 24) | ((bytes(i + 1) & 0xFFL) << 16) |
      ((bytes(i + 2) & 0xFFL) << 8) | (bytes(i + 3) & 0xFFL)
    var p = 0; var mdatAt = -1
    while (p + 8 <= bytes.length && mdatAt < 0) {
      if (new String(bytes, p + 4, 4, "US-ASCII") == "mdat") mdatAt = p + 8
      else p += u32(p).toInt
    }
    assert(mdatAt > 0)
    val stcoHex = java.util.HexFormat.of().formatHex(bytes)
    val stcoIdx = stcoHex.indexOf("7374636f") / 2 // 'stco'
    val stcoOff = u32(stcoIdx + 12)
    assert(stcoOff == mdatAt, s"stco says $stcoOff, mdat payload is at $mdatAt")
    // 'sowt' (little-endian) variant decodes through the same walk
    val le = bytes.clone()
    val twosIdx = stcoHex.indexOf("74776f73") / 2 // 'twos'
    le(twosIdx) = 's'; le(twosIdx + 1) = 'o'; le(twosIdx + 2) = 'w'; le(twosIdx + 3) = 't'
    val decLe = PixelCodecUtil.decodeMp4PcmSamples(le)
    assert(decLe != null && decLe.samples.length == samples.length)
    assert(decLe.samples.toSeq == samples.toSeq.map(v =>
      (((v & 0xFF) << 8) | ((v >> 8) & 0xFF)).toShort.toInt), "byte-swapped read")
    // identical samples through MP4 and WAV produce IDENTICAL features —
    // the sample layer is format-independent once really decoded
    val wav = PixelCodecUtil.encodeWavSamples(16000, 2, 16, samples)
    assert(Multimodal.decodeFeatures(bytes).toSeq == Multimodal.decodeFeatures(wav).toSeq,
      "MP4 and WAV carrying the same PCM must extract the same features")
    assert(PixelCodecUtil.decodeMp4PcmSamples("not an mp4".getBytes) == null)
    // header-only encodeMp4 (no track) falls through cleanly
    assert(PixelCodecUtil.decodeMp4PcmSamples(MediaCodecUtil.encodeMp4(600, 100, 3)) == null)
  }

  test("malformed media payloads return null from every decoder — never a task-killing throw") {
    import graft.functions.{JpegCodecUtil, PixelCodecUtil}
    // JPEG: DHT whose declared length can't hold its 16 length counts
    assert(JpegCodecUtil.decodeJpegPixels(
      Array(0xFF, 0xD8, 0xFF, 0xC4, 0x00, 0x03, 0x00).map(_.toByte)) == null)
    // JPEG: SOF with 3 components but a too-short declared length
    assert(JpegCodecUtil.decodeJpegPixels(
      Array(0xFF, 0xD8, 0xFF, 0xC0, 0x00, 0x09, 8, 0, 16, 0, 16, 3).map(_.toByte)) == null)
    // GIF: image descriptor declaring 65535x65535 (iw*ih overflows Int)
    val hugeGif = Array[Int](
      'G', 'I', 'F', '8', '9', 'a', 0xFF, 0xFF, 0xFF, 0xFF, 0x00, 0, 0,
      0x2C, 0, 0, 0, 0, 0xFF, 0xFF, 0xFF, 0xFF, 0x00, 0x02, 0x00, 0x3B
    ).map(_.toByte)
    assert(PixelCodecUtil.decodeGifPixels(hugeGif) == null)
    // MP4: valid tree but an stco entry count far beyond its box size
    val good = PixelCodecUtil.encodeMp4PcmSamples(8000, 1, Array.fill(16)(7))
    val hex = java.util.HexFormat.of().formatHex(good)
    val stcoAt = hex.indexOf("7374636f") / 2 // 'stco' tag
    val broken = good.clone()
    broken(stcoAt + 8) = 0x7F.toByte // entry count 0x7F…: lies vs box size
    assert(PixelCodecUtil.decodeMp4PcmSamples(broken) == null)
    // MP4: truncated right after moov — mdat offsets dangle
    assert(PixelCodecUtil.decodeMp4PcmSamples(
      good.take(good.length - 20)) == null)
    // all of them fall through extractFeatures' probe chain to the stub
    Seq(hugeGif, broken).foreach(p => Multimodal.decodeFeatures(p))
  }

  test("feature extraction REALLY decodes PNG pixels and WAV samples (not the stub)") {
    import graft.functions.PixelCodecUtil
    // two images identical except one pixel: features must both reflect
    // real pixel stats (mean channel values in [0,1]) and differ
    val a = PixelCodecUtil.encodePngPixels(16, 16, (x, y) => (x * 16 + y) << 8 | 0xFF)
    val b = PixelCodecUtil.encodePngPixels(16, 16,
      (x, y) => if (x == 3 && y == 3) 0xFFFFFFFF else (x * 16 + y) << 8 | 0xFF)
    val fa = Multimodal.decodeFeatures(a)
    val fb = Multimodal.decodeFeatures(b)
    assert(fa.forall(v => v >= -1.0f && v <= 1.0f), "pixel stats are normalized")
    assert(fa.toSeq != fb.toSeq, "one-pixel change must move real pixel stats")
    assert(math.abs(fa.slice(8, 16).sum - 1.0f) < 1e-5, "luminance histogram sums to 1")
    // silent audio vs a tone: RMS (feature 1) separates them
    val silent = PixelCodecUtil.encodeWavSamples(8000, 1, 16, Array.fill(100)(0))
    val tone = PixelCodecUtil.encodeWavSamples(8000, 1, 16,
      Array.tabulate(100)(i => (math.sin(i * 0.3) * 20000).toInt))
    val fs = Multimodal.decodeFeatures(silent)
    val ft = Multimodal.decodeFeatures(tone)
    assert(fs(1) == 0.0f && ft(1) > 0.3f, s"RMS: silent=${fs(1)} tone=${ft(1)}")
    assert(ft(3) > 0.5f, "peak amplitude of a near-full-scale tone")
    // FLAC payloads route through the REAL lossless decode: identical PCM
    // through WAV and FLAC containers extracts IDENTICAL features
    val pcm = Array.tabulate(400)(i => (math.sin(i * 0.21) * 18000).toInt)
    val viaWav = Multimodal.decodeFeatures(
      PixelCodecUtil.encodeWavSamples(8000, 1, 16, pcm))
    val viaFlac = Multimodal.decodeFeatures(
      graft.functions.FlacCodecUtil.encodeFlac(Array(pcm), 8000, 16))
    assert(viaFlac.toSeq == viaWav.toSeq,
      "FLAC and WAV of the same PCM must yield identical features")
    assert(viaFlac(1) > 0.3f, "FLAC features come from real samples, not the stub")
    // STEREO: the FLAC path must interleave channels to match the WAV
    // frame order (zero-crossing stats are order-sensitive)
    val left = Array.tabulate(300)(i => (math.sin(i * 0.17) * 15000).toInt)
    val right = Array.tabulate(300)(i => (math.cos(i * 0.29) * 9000).toInt)
    val interleaved = Array.tabulate(600)(i => if (i % 2 == 0) left(i / 2) else right(i / 2))
    val stereoWav = Multimodal.decodeFeatures(
      PixelCodecUtil.encodeWavSamples(8000, 2, 16, interleaved))
    val stereoFlac = Multimodal.decodeFeatures(
      graft.functions.FlacCodecUtil.encodeFlac(Array(left, right), 8000, 16))
    assert(stereoFlac.toSeq == stereoWav.toSeq,
      "stereo FLAC features must match the interleaved WAV path")
  }

  test("pixel media table -> feature extraction runs the real PNG decode distributed") {
    val pixMedia = Multimodal.pixelMediaTable(docs.limit(50))
      .withColumn("kind", lit("image"))
      .withColumn("width", lit(24)).withColumn("height", lit(16))
      .withColumn("duration_ms", lit(0L))
    val feats = Multimodal.extractFeatures(pixMedia, batchSize = 16).collect()
    assert(feats.length == 50)
    // real pixel stats: every feature vector is a valid stat block (means
    // in [0,1], histogram sums to 1) and distinct ids give distinct stats
    feats.foreach { f =>
      assert(f.features.take(8).forall(v => v >= 0f && v <= 1f))
      assert(math.abs(f.features.drop(8).sum - 1.0f) < 1e-5)
    }
    assert(feats.map(_.features.toSeq).distinct.length > 40,
      "id-derived pixels must yield distinct feature vectors")
  }

  test("IMA ADPCM: decode matches an independent reference decoder bit-for-bit; error bounded") {
    import graft.functions.AdpcmCodecUtil
    // a smooth two-tone signal the adaptive step can track
    val n = 4000
    val samples = Array.tabulate(n)(i =>
      (8000 * math.sin(i * 0.05) + 2500 * math.sin(i * 0.013 + 1.0)).toInt)
    val wav = AdpcmCodecUtil.encodeWavImaAdpcm(22050, samples, blockAlign = 256)
    val got = AdpcmCodecUtil.decodeWavImaAdpcmSamples(wav)
    assert(got != null && got.length == n)

    // independent sequential reference decoder (tables re-derived from the
    // IMA spec, written against the WAV block layout directly)
    val stepT = {
      // the 89-entry table via the spec's 1.1^n generator, rounded — must
      // reproduce the implementation's constants exactly
      val t = Array(7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28,
        31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
        494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
        1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
        4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767)
      t
    }
    val idxT = Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
    def refDecode(b: Array[Byte]): Array[Int] = {
      def u16(i: Int) = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
      def u32(i: Int) = (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
        ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
      val blockAlign = u16(32); val factN = u32(48).toInt; val dOff = 60
      val spb = (blockAlign - 4) * 2 + 1
      val out = Array.newBuilder[Int]
      var w = 0; var blk = 0
      while (w < factN) {
        val base = dOff + blk * blockAlign
        var p = u16(base).toShort.toInt; var ix = b(base + 2) & 0xFF
        out += p; w += 1
        var k = 1
        while (k < spb && w < factN) {
          val by = b(base + 4 + (k - 1) / 2)
          val code = if ((k - 1) % 2 == 0) by & 0x0F else (by >> 4) & 0x0F
          val step = stepT(ix)
          var d = step >> 3
          if ((code & 4) != 0) d += step
          if ((code & 2) != 0) d += step >> 1
          if ((code & 1) != 0) d += step >> 2
          p = math.max(-32768, math.min(32767, if ((code & 8) != 0) p - d else p + d))
          ix = math.max(0, math.min(88, ix + idxT(code)))
          out += p; w += 1
          k += 1
        }
        blk += 1
      }
      out.result()
    }
    assert(got.toSeq == refDecode(wav).toSeq, "decoder must match the reference bit-for-bit")

    // lossy error bound on a trackable signal: RMS error well under 5% of amplitude
    val rms = math.sqrt(samples.zip(got).map { case (a, b) => val d = (a - b).toDouble; d * d }
      .sum / n)
    assert(rms < 400.0, s"ADPCM rms error $rms too high for a smooth signal")

    // malformed payloads: truncated, bad step index, oversized fact → null
    assert(AdpcmCodecUtil.decodeWavImaAdpcmSamples(wav.take(40)) == null)
    val badIdx = wav.clone; badIdx(62) = 120.toByte // first block's step index
    assert(AdpcmCodecUtil.decodeWavImaAdpcmSamples(badIdx) == null)
    val badFact = wav.clone
    badFact(48) = 0xFF.toByte; badFact(49) = 0xFF.toByte
    badFact(50) = 0xFF.toByte; badFact(51) = 0x7F.toByte
    assert(AdpcmCodecUtil.decodeWavImaAdpcmSamples(badFact) == null)

    // feature dispatch: the ADPCM WAV routes through the REAL sample
    // decode — its features equal those of a 16-bit PCM WAV holding the
    // decoded samples (both paths land in the same sample-stats kernel)
    def pcm16Wav(rate: Int, s: Array[Int]): Array[Byte] = {
      val dataLen = s.length * 2
      val out = new Array[Byte](44 + dataLen)
      def tag(i: Int, t: String): Unit = (0 until 4).foreach(j => out(i + j) = t(j).toByte)
      def p16(i: Int, v: Int): Unit = { out(i) = (v & 0xFF).toByte; out(i + 1) = ((v >> 8) & 0xFF).toByte }
      def p32(i: Int, v: Long): Unit = (0 until 4).foreach(j => out(i + j) = ((v >> (8 * j)) & 0xFF).toByte)
      tag(0, "RIFF"); p32(4, 36L + dataLen); tag(8, "WAVE")
      tag(12, "fmt "); p32(16, 16); p16(20, 1); p16(22, 1); p32(24, rate)
      p32(28, rate * 2L); p16(32, 2); p16(34, 16)
      tag(36, "data"); p32(40, dataLen)
      s.indices.foreach(i => p16(44 + 2 * i, s(i) & 0xFFFF))
      out
    }
    val fAdpcm = Multimodal.decodeFeatures(wav)
    val fPcm = Multimodal.decodeFeatures(pcm16Wav(22050, got))
    assert(fAdpcm.toSeq == fPcm.toSeq,
      "ADPCM must decode for real — identical features to the decoded-PCM twin")
  }

  test("perceptual hash: PNG→JPEG re-encode stays within Hamming 3; different images far; pairs found") {
    import graft.functions.{JpegCodecUtil, PixelCodecUtil}
    val (w, h) = (72, 48)
    // a smooth gradient image in two containers + a genuinely different image
    // 0xRRGGBB content; PNG wants (r<<24|g<<16|b<<8|a), JPEG wants 0xRRGGBB
    def smooth(x: Int, y: Int): Int = ((x * 3) << 16) | ((y * 4) << 8) | ((x + y) & 0xFF)
    def other(x: Int, y: Int): Int = (((w - x) * 3) << 16) | (((h - y) * 5) << 8) | 0x40
    def asPng(f: (Int, Int) => Int): (Int, Int) => Int = (x, y) => (f(x, y) << 8) | 0xFF
    val png = PixelCodecUtil.encodePngPixels(w, h, asPng(smooth))
    val jpg = JpegCodecUtil.encodeJpegPixels(w, h, quality = 90, smooth)
    val diff = PixelCodecUtil.encodePngPixels(w, h, asPng(other))
    val hp = Multimodal.perceptualHash(png).longValue()
    val hj = Multimodal.perceptualHash(jpg).longValue()
    val hd = Multimodal.perceptualHash(diff).longValue()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hp, hj) <= 3, s"re-encode drifted ${ham(hp, hj)} bits")
    assert(ham(hp, hd) >= 10, s"different images too close: ${ham(hp, hd)}")
    assert(Multimodal.perceptualHash("junk".getBytes) == null)

    // the pairs operator finds the re-encoded copy, not the different image
    val media = Seq(
      (1L, png), (2L, jpg), (3L, diff)
    ).toDF("media_id", "media")
    val pairs = Multimodal.imageNearDupPairs(media)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("MJPEG MP4: per-frame sample-table walk decodes each frame through the real JPEG codec") {
    import graft.functions.{JpegCodecUtil, PixelCodecUtil}
    val (w, h) = (48, 32)
    // three DIFFERENT frames so a mis-walked sample table cannot pass
    val frames = Array.tabulate(3)(f =>
      JpegCodecUtil.encodeJpegPixels(w, h, quality = 80,
        (x, y) => ((x * 5 + f * 40) << 16) | ((y * 7) << 8) | (f * 90 & 0xFF)))
    val mp4 = PixelCodecUtil.encodeMp4Mjpeg(w, h, fps = 12, frames)
    val got = PixelCodecUtil.decodeMp4MjpegFrames(mp4)
    assert(got != null && got.frames.length == 3 &&
      got.width == w && got.height == h && got.timescale == 12)
    // every frame equals its direct single-JPEG decode, pixel for pixel
    for (f <- 0 until 3) {
      val direct = JpegCodecUtil.decodeJpegPixels(frames(f))
      assert(direct != null && got.frames(f).sameElements(direct),
        s"frame $f diverged from its direct decode")
    }
    // malformed guards: truncated payload, lying stsz size → null
    assert(PixelCodecUtil.decodeMp4MjpegFrames(mp4.take(mp4.length - 40)) == null)
    val lying = mp4.clone
    // first stsz per-sample entry lives right after the stsz header; find it
    val stszAt = {
      var i = 0; var at = -1
      while (i + 8 <= lying.length && at < 0) {
        if (lying(i + 4) == 's' && lying(i + 5) == 't' &&
            lying(i + 6) == 's' && lying(i + 7) == 'z') at = i
        i += 1
      }
      at
    }
    assert(stszAt > 0)
    lying(stszAt + 20) = 0x7F.toByte // first sample size becomes enormous
    assert(PixelCodecUtil.decodeMp4MjpegFrames(lying) == null)

    // the feature path routes MJPEG through the REAL pixel decode: a
    // one-frame MJPEG yields exactly the single JPEG's features
    val one = PixelCodecUtil.encodeMp4Mjpeg(w, h, fps = 1, Array(frames(0)))
    assert(Multimodal.decodeFeatures(one).toSeq ==
      Multimodal.decodeFeatures(frames(0)).toSeq)
  }

  test("extracted features feed the ANN stack end-to-end: a payload copy is its own top hit") {
    // the media -> features -> similarity composition a multimodal dedup
    // pipeline runs; a planted byte-identical payload must come back as
    // the nearest neighbor at cosine 1 (the decode stub is deterministic)
    val copy = media.filter(col("media_id") === 7)
      .withColumn("media_id", lit(100007L))
    val feats = Multimodal.extractFeatures(media.unionByName(copy)).toDF()
      .select(col("media_id").as("vec_id"), col("features").as("embedding"))
    val top = graft.operators.Similarity.bruteForceTopK(
        feats, feats.filter(col("vec_id") === 100007L), k = 1)
      .select("neighbor_id", "cos_sim").as[(Long, Double)].head()
    assert(top._1 == 7L && top._2 > 0.999999,
      s"byte-identical media must be the top neighbor at cosine 1, got $top")
  }

  test("real resize: nearest-neighbor picks exact source pixels, identity within bounds") {
    import graft.functions.PixelCodecUtil
    val (w, h) = (16, 8)
    def pix(x: Int, y: Int): Int = ((x * 17) << 24) | ((y * 31) << 16) | ((x ^ y) << 8) | 0xFF
    val png = PixelCodecUtil.encodePngPixels(w, h, pix)

    // within bounds: the ORIGINAL byte array comes back untouched
    assert(Multimodal.resizeImage(png, 16) eq png)

    // 2x downscale: dst (8,4); nearest map src = (dst*src) div dst picks (2x, 2y)
    val out = Multimodal.resizeImage(png, 8)
    val meta = graft.functions.ImageCodecUtil.parse(out)
    assert(meta.getInt(1) == 8 && meta.getInt(2) == 4)
    val got = PixelCodecUtil.decodePngPixels(out)
    for (y <- 0 until 4; x <- 0 until 8)
      assert(got(y * 8 + x) == pix(x * 2, y * 2), s"pixel ($x,$y)")

    // aspect preserved on a non-square bound: 16x8 → maxDim 4 ⇒ 4x2
    val small = Multimodal.resizeImage(png, 4)
    val sm = graft.functions.ImageCodecUtil.parse(small)
    assert(sm.getInt(1) == 4 && sm.getInt(2) == 2)

    // garbage → null (dead-letter contract)
    assert(Multimodal.resizeImage(Array[Byte](1, 2, 3), 8) == null)
  }

  test("real resize runs distributed over all three image codecs") {
    val docs = spark.range(0, 30).toDF("doc_id")
    val media = Multimodal.pixelMediaTable(docs) // 24x16 PNG/GIF/JPEG payloads
    val out = Multimodal.resizeImages(media, maxDim = 8).collect()
    assert(out.length == 30, "every payload decodes and resizes")
    assert(out.forall(r => r.out_width == 8 && r.out_height == 5)) // 24x16 → 8x5
    // each output is a decodable PNG whose pixels are the nearest-neighbor
    // resample of the source's DECODED pixels
    import graft.functions.{ImageCodecUtil, JpegCodecUtil, PixelCodecUtil}
    val src = media.select("media_id", "media")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    out.foreach { r =>
      val sp = {
        val p = PixelCodecUtil.decodePngPixels(src(r.media_id))
        if (p != null) p else {
          val g = PixelCodecUtil.decodeGifPixels(src(r.media_id))
          if (g != null) g else JpegCodecUtil.decodeJpegPixels(src(r.media_id))
        }
      }
      val got = PixelCodecUtil.decodePngPixels(r.media)
      for (y <- 0 until 5; x <- 0 until 8)
        assert(got(y * 8 + x) == sp((y * 16 / 5) * 24 + (x * 24 / 8)),
          s"media ${r.media_id} pixel ($x,$y)")
    }
  }

  test("real frame sampling: every Nth MJPEG frame lands as a lossless PNG") {
    import graft.functions.{JpegCodecUtil, PixelCodecUtil}
    import spark.implicits._
    val (w, h) = (32, 24)
    val frames = Array.tabulate(5)(f =>
      JpegCodecUtil.encodeJpegPixels(w, h, quality = 85,
        (x, y) => ((x * 3 + f * 50) << 16) | ((y * 5) << 8) | (f * 40 & 0xFF)))
    val mp4 = PixelCodecUtil.encodeMp4Mjpeg(w, h, fps = 10, frames)
    val media = Seq((1L, mp4)).toDF("media_id", "media")
    val got = Multimodal.sampleVideoFramePixels(media, everyN = 2).collect()
      .sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    val decoded = PixelCodecUtil.decodeMp4MjpegFrames(mp4)
    got.foreach { fr =>
      val png = PixelCodecUtil.decodePngPixels(fr.media)
      assert(png.sameElements(decoded.frames(fr.frame_idx)),
        s"frame ${fr.frame_idx} must round-trip losslessly")
    }
    // a non-video payload yields no rows
    val img = PixelCodecUtil.encodePngPixels(4, 4, (x, y) => (x << 8) | y | 0xFF000000)
    assert(Multimodal.sampleVideoFramePixels(
      Seq((2L, img)).toDF("media_id", "media")).isEmpty)
  }
}
