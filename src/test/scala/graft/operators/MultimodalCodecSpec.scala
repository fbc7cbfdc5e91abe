package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The BMP/WAV header parser against ground truth that is NOT our own
  * arithmetic: the JDK's ImageIO (BMP) and AudioSystem (WAV) readers parse
  * the same fixture bytes, so an encoder/decoder pair that agreed on a
  * wrong layout (offset, endianness, padding) is caught by an independent
  * implementation. Pure JVM — no SparkSession needed. */
class MultimodalCodecSpec extends AnyFunSuite {

  test("built BMPs parse back and agree with ImageIO") {
    for ((w, h) <- Seq((1, 1), (2, 3), (64, 48), (17, 29))) {
      val bytes = Multimodal.buildBmp(w, h)
      val m = Multimodal.decodeOne(7L, bytes)
      assert((m.format, m.width, m.height, m.n_frames) == ("bmp", w, h, 1L))
      assert(m.n_bytes == bytes.length.toLong)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected our ${w}x$h BMP")
      assert(img.getWidth == w && img.getHeight == h,
        s"ImageIO read ${img.getWidth}x${img.getHeight}, built ${w}x$h")
    }
  }

  test("top-down BMP (negative biHeight) reports the height magnitude") {
    val bytes = Multimodal.buildBmp(5, 4)
    // flip biHeight to -4 (little-endian i32 at offset 22)
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -4)
    val m = Multimodal.decodeOne(1L, bytes)
    assert(m.format == "bmp" && m.width == 5L && m.height == 4L)
  }

  test("built WAVs parse back and agree with AudioSystem") {
    for ((sr, ch, bits, ns) <- Seq((8000, 1, 8, 5), (44100, 2, 16, 50),
        (11000, 1, 16, 7), (12000, 2, 8, 9))) {
      val bytes = Multimodal.buildWav(sr, ch, bits, ns)
      val m = Multimodal.decodeOne(3L, bytes)
      assert(m.format == "wav" && m.sample_rate == sr.toLong &&
        m.channels == ch.toLong && m.n_frames == ns.toLong,
        s"parsed $m for ($sr,$ch,$bits,$ns)")
      assert(m.n_bytes == bytes.length.toLong)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = ais.getFormat
      assert(f.getSampleRate.toInt == sr && f.getChannels == ch &&
        f.getSampleSizeInBits == bits)
      assert(ais.getFrameLength == ns.toLong,
        s"AudioSystem frames ${ais.getFrameLength}, built $ns")
    }
  }

  test("WAV chunk walk skips unknown chunks (incl. odd-size RIFF padding)") {
    // RIFF/WAVE with a 3-byte 'LIST' chunk (odd → 1 pad byte) BEFORE fmt —
    // real encoders emit such metadata chunks; a parser assuming the
    // canonical 44-byte layout would misread fmt fields from LIST bytes.
    val base = Multimodal.buildWav(16000, 2, 16, 11)
    val extra = java.nio.ByteBuffer.allocate(base.length + 8 + 3 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(base, 0, 12)                      // RIFF size WAVE
    extra.put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](1, 2, 3, 0))             // 3 bytes + pad
    extra.put(base, 12, base.length - 12)       // fmt + data as-is
    val bytes = extra.array()
    // keep the RIFF size honest
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, bytes.length - 8)
    val m = Multimodal.decodeOne(9L, bytes)
    assert(m.format == "wav" && m.sample_rate == 16000L &&
      m.channels == 2L && m.n_frames == 11L)
  }

  test("codec round-trip law holds over generated parameter space") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val bmpGen = for {
      w <- Gen.choose(1, 300); h <- Gen.choose(1, 200)
    } yield (w, h)
    val wavGen = for {
      sr <- Gen.choose(1000, 192000); ch <- Gen.choose(1, 8)
      bits <- Gen.oneOf(8, 16, 24, 32); ns <- Gen.choose(0, 500)
    } yield (sr, ch, bits, ns)
    val bmpProp = forAll(bmpGen) { case (w, h) =>
      val m = Multimodal.decodeOne(0L, Multimodal.buildBmp(w, h))
      m.format == "bmp" && m.width == w && m.height == h && m.n_frames == 1L
    }
    val wavProp = forAll(wavGen) { case (sr, ch, bits, ns) =>
      val m = Multimodal.decodeOne(0L, Multimodal.buildWav(sr, ch, bits, ns))
      m.format == "wav" && m.sample_rate == sr && m.channels == ch &&
        m.n_frames == ns
    }
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(200)
    for ((name, p) <- Seq("bmp" -> bmpProp, "wav" -> wavProp)) {
      val r = org.scalacheck.Test.check(params, p)
      assert(r.passed, s"$name round-trip property failed: ${r.status}")
    }
  }

  test("non-media payloads decode as unknown with zero metadata") {
    for (payload <- Seq(Array.empty[Byte], "hello world".getBytes("UTF-8"),
        "BM".getBytes("US-ASCII"),               // magic but truncated
        "RIFFxxxxWAVE".getBytes("US-ASCII"))) {  // WAVE but no fmt/data
      val m = Multimodal.decodeOne(5L, payload)
      assert(m.format == "unknown" &&
        (m.width, m.height, m.n_frames, m.sample_rate, m.channels) ==
          (0L, 0L, 0L, 0L, 0L))
      assert(m.n_bytes == payload.length.toLong)
    }
  }

  test("adversarial WAV chunk sizes terminate and decode as unknown/wav") {
    // u32 sizes whose i32 truncation is negative or huge: 0xFFFFFFF8 (-8,
    // the non-advancing offset), 0xFFFFFFFF (-1, odd → pad would 'fix' it
    // to 0 advance), 0x80000000 (i32 min), and a size that overruns the
    // payload but stays positive as i32. None may loop or throw.
    def riffWith(chunkId: String, size: Long, tail: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + 8 + tail.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(0)
        .put("WAVE".getBytes("US-ASCII"))
      b.put(chunkId.getBytes("US-ASCII")).putInt(size.toInt)
      b.put(tail)
      b.array()
    }
    for (size <- Seq(0xFFFFFFF8L, 0xFFFFFFFFL, 0x80000000L, 0x7FFFFFFFL,
        1000L)) {
      val m = Multimodal.decodeOne(1L, riffWith("JUNK", size, new Array[Byte](16)))
      assert(m.format == "unknown", s"size=$size gave $m")
    }
    // a VALID fmt chunk followed by a corrupt-size data chunk: the walk must
    // stop at the corrupt chunk; with no data size recorded → unknown
    val good = Multimodal.buildWav(8000, 1, 8, 10)
    val corrupt = java.nio.ByteBuffer
      .allocate(36 + 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(good, 0, 36)                              // RIFF..WAVE + fmt chunk
      .put("data".getBytes("US-ASCII")).putInt(0xFFFFFFF8L.toInt)
      .array()
    assert(Multimodal.decodeOne(2L, corrupt).format == "unknown")
    // and a truncated-but-otherwise-valid data chunk (size overruns payload
    // by one byte) also terminates without recording the data size
    val trunc = good.dropRight(1)
    assert(Multimodal.decodeOne(3L, trunc).format == "unknown")
  }

  test("decodeOne total over random and RIFF-prefixed random bytes") {
    // Property: for ANY byte payload, decodeOne terminates quickly and
    // returns a MediaMeta (never throws, never hangs). Random bytes rarely
    // hit the RIFF path, so also force the 'RIFF....WAVE' prefix and let the
    // chunk walk chew random chunk ids/sizes.
    val rnd = new scala.util.Random(0xC0DEC5L)
    for (trial <- 0 until 500) {
      val len = rnd.nextInt(256)
      val raw = new Array[Byte](len); rnd.nextBytes(raw)
      val m1 = Multimodal.decodeOne(trial.toLong, raw)
      assert(m1.n_bytes == len.toLong)
      val forced = new Array[Byte](12 + len); rnd.nextBytes(forced)
      System.arraycopy("RIFF".getBytes("US-ASCII"), 0, forced, 0, 4)
      System.arraycopy("WAVE".getBytes("US-ASCII"), 0, forced, 8, 4)
      val m2 = Multimodal.decodeOne(trial.toLong, forced)
      assert(m2.n_bytes == forced.length.toLong)
      assert(m2.format == "unknown" || m2.format == "wav")
    }
  }

  test("syntheticMedia fixture arithmetic matches the parsed metadata law") {
    // the same integer formulas the DuckDB oracle uses, checked here
    // against the encode→parse round trip without Spark
    for (id <- 0L to 200L) {
      val payload =
        if (id % 2 == 0) Multimodal.buildBmp((id % 64).toInt + 1, (id % 48).toInt + 1)
        else Multimodal.buildWav(8000 + (id % 8).toInt * 1000,
          if (id % 4 == 1) 1 else 2, if (id % 8 < 4) 8 else 16,
          (id % 50).toInt + 5)
      val m = Multimodal.decodeOne(id, payload)
      if (id % 2 == 0) {
        val (w, h) = (id % 64 + 1, id % 48 + 1)
        val stride = ((3 * w + 3) / 4) * 4
        assert(m == Multimodal.MediaMeta(id, 54 + stride * h, "bmp", w, h, 1, 0, 0))
      } else {
        val ch = if (id % 4 == 1) 1L else 2L
        val bits = if (id % 8 < 4) 8L else 16L
        val ns = id % 50 + 5
        val ds = ns * (ch * bits / 8)
        assert(m == Multimodal.MediaMeta(id, 44 + ds + ds % 2, "wav", 0, 0,
          ns, 8000 + (id % 8) * 1000, ch))
      }
    }
  }
}
