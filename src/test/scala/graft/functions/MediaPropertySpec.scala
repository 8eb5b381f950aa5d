package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the media codecs on ARBITRARY inputs, beyond the
  * fixture shapes the unit specs pin. Deterministic seeds, so failures
  * reproduce. FLAC is lossless, so the property IS exact equality. */
class MediaPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("property: FLAC round-trips arbitrary PCM losslessly (lengths, channels, depths, blocks)") {
    val cases = Gen.zip(
      Gen.choose(1, 4000),                 // sample count
      Gen.oneOf(8, 16),                    // bit depth
      Gen.oneOf(1, 2),                     // channels
      Gen.oneOf(16, 192, 577, 1024),      // block size (incl. non-power-of-2)
      Gen.oneOf("noise", "ramp", "const", "steps", "alternate"))
    for (seed <- 0L until 40L) {
      val (n, bits, nch, block, shape) = sample(cases, seed)
      val rnd = new scala.util.Random(seed * 31 + 7)
      val lim = 1 << (bits - 1)
      def gen(c: Int): Array[Int] = Array.tabulate(n)(i => shape match {
        case "noise" => rnd.nextInt(2 * lim) - lim
        case "ramp" => (i * (c + 3)) % (2 * lim) - lim
        case "const" => (seed % lim).toInt - (c * 7)
        case "steps" => ((i / 50) * 997) % (2 * lim) - lim
        case _ => if (i % 2 == 0) lim - 1 else -lim
      })
      val ch = Array.tabulate(nch)(gen)
      val dec = FlacCodecUtil.decodeFlac(
        FlacCodecUtil.encodeFlac(ch, 44100, bits, block))
      assert(dec != null, s"seed=$seed case=($n,$bits,$nch,$block,$shape)")
      assert(dec.bits == bits && dec.channels == nch && dec.totalSamples == n.toLong)
      for (c <- 0 until nch)
        assert(dec.samples(c).toSeq == ch(c).toSeq,
          s"seed=$seed case=($n,$bits,$nch,$block,$shape) channel $c")
    }
  }

  test("property: Ogg pages round-trip arbitrary payload sizes (lacing incl. 255 boundaries)") {
    for (seed <- 0L until 60L) {
      val plen = sample(Gen.oneOf(Gen.choose(0, 600),
        Gen.oneOf(0, 254, 255, 256, 509, 510, 511)), seed)
      val total = sample(Gen.choose(0L, 1L << 40), seed + 1000)
      val rate = sample(Gen.oneOf(8000, 44100, 192000), seed + 2000)
      val ch = sample(Gen.choose(1, 8), seed + 3000)
      val serial = sample(Gen.choose(0, Int.MaxValue), seed + 4000)
      val m = MediaCodecUtil.parseOggVorbis(
        MediaCodecUtil.encodeOggVorbis(ch, rate, total, plen, serial))
      assert(m != null, s"seed=$seed plen=$plen")
      assert(m.getInt(1) == rate && m.getInt(2) == ch && m.getLong(3) == 2L &&
        m.getLong(4) == total && m.getLong(5) == serial.toLong,
        s"seed=$seed plen=$plen total=$total: $m")
    }
  }

  test("property: ADTS frame chains round-trip arbitrary configs") {
    for (seed <- 0L until 60L) {
      val sfi = sample(Gen.choose(0, 12), seed)
      val ch = sample(Gen.choose(1, 7), seed + 100)
      val frames = sample(Gen.choose(1, 30), seed + 200)
      val plen = sample(Gen.oneOf(Gen.choose(0, 200), Gen.oneOf(0, 2040, 2041, 8177)), seed + 300)
      val m = MediaCodecUtil.parseAdts(MediaCodecUtil.encodeAdts(sfi, ch, frames, plen))
      assert(m != null, s"seed=$seed")
      assert(m.getInt(1) == MediaCodecUtil.AdtsRates(sfi) && m.getInt(2) == ch &&
        m.getLong(4) == frames.toLong && m.getLong(5) == frames * 1024L,
        s"seed=$seed sfi=$sfi ch=$ch frames=$frames plen=$plen: $m")
    }
  }

  test("property: corrupted FLAC bytes never decode to wrong samples (null or exact)") {
    val rnd = new scala.util.Random(99)
    val pcm = Array.tabulate(800)(i => (math.sin(i * 0.1) * 12000).toInt + rnd.nextInt(100))
    val enc = FlacCodecUtil.encodeFlac(Array(pcm), 16000, 16, blockSize = 256)
    var caught = 0
    for (trial <- 0 until 120) {
      val bad = enc.clone()
      val off = rnd.nextInt(enc.length)
      bad(off) = (bad(off) ^ (1 << rnd.nextInt(8))).toByte
      val dec = FlacCodecUtil.decodeFlac(bad)
      if (dec == null) caught += 1
      else {
        // a surviving decode must still be SAMPLE-EXACT (the flip landed
        // in a region whose bytes don't affect the samples or their
        // integrity checks never fired because nothing material changed)
        assert(dec.samples(0).toSeq == pcm.toSeq,
          s"trial=$trial off=$off: corrupted stream decoded to WRONG samples")
      }
    }
    // CRC/MD5/count gates must catch the overwhelming majority
    assert(caught >= 110, s"only $caught/120 corruptions caught")
  }
}
