package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("binary payload round-trips with correct byte counts and digests") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length == 500)
    val one = feats.find(_.media_id == 0L).get
    assert(one.n_bytes > 0)
    assert(one.digest.matches("[0-9a-f]{32}"))
    assert(one.feature.length == Multimodal.MediaCodec.FeatureDim)
  }

  test("stub decode is deterministic across runs") {
    val a = Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(spark, sf))
      .filter(_.media_id < 10).collect().sortBy(_.media_id)
    val b = Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(spark, sf))
      .filter(_.media_id < 10).collect().sortBy(_.media_id)
    assert(a.map(_.digest).toSeq == b.map(_.digest).toSeq)
    assert(a.map(_.feature.toSeq).toSeq == b.map(_.feature.toSeq).toSeq)
  }

  test("PNG codec: encode → decode round-trips exact pixel sums and dimensions") {
    // a 3x2 image with hand-computable channel sums
    val px = Array(
      Array(0xFF0000, 0x00FF00, 0x0000FF), // r=255, g=255, b=255
      Array(0x102030, 0x405060, 0x708090)) // r=0x10+0x40+0x70 ...
    val bytes = Multimodal.MediaCodec.encodePng(3, 2, (x, y) => px(y)(x))
    // PNG magic: real encoded output, not a fake
    assert((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P'.toByte &&
      bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte)
    val Some((w, h, sr, sg, sb)) = Multimodal.MediaCodec.decodeImage(bytes)
    assert((w, h) == (3, 2))
    assert(sr == 255L + 0x10 + 0x40 + 0x70)
    assert(sg == 255L + 0x20 + 0x50 + 0x80)
    assert(sb == 255L + 0x30 + 0x60 + 0x90)
  }

  test("image decode stage skips undecodable payloads (skip-entity policy)") {
    import spark.implicits._
    val good = Multimodal.MediaCodec.encodePng(2, 2, (_, _) => 0x7F7F7F)
    val rows = Seq(
      Multimodal.MediaRecord(1L, good, "image/png", "mem://ok", Some(2), Some(2), None),
      Multimodal.MediaRecord(2L, Array[Byte](1, 2, 3), "image/png", "mem://bad", None, None, None),
      Multimodal.MediaRecord(3L, good, "image/png", "mem://ok2", Some(2), Some(2), None)
    ).toDS()
    val out = Multimodal.decodeImageStats(rows).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L, 3L)) // row 2 skipped, not fatal
    assert(out.forall(s => s.sum_r == 4 * 0x7F && s.width == 2 && s.height == 2))
  }

  test("pngFromDocuments: decoded stats match the closed-form pixel function") {
    val stats = Multimodal.decodeImageStats(
      Multimodal.pngFromDocuments(spark, sf))
      .filter(_.media_id < 20).collect().sortBy(_.media_id)
    assert(stats.length == 20)
    stats.foreach { s =>
      val id = s.media_id
      val (w, h) = ((4 + id % 5).toInt, (4 + id % 3).toInt)
      assert((s.width, s.height) == (w, h))
      val expected = for { x <- 0 until w; y <- 0 until h } yield
        ((id * 31 + x * 7 + y * 13) % 256,
         (id * 17 + x * 11 + y * 3) % 256,
         (id * 23 + x * 5 + y * 19) % 256)
      assert(s.sum_r == expected.map(_._1).sum)
      assert(s.sum_g == expected.map(_._2).sum)
      assert(s.sum_b == expected.map(_._3).sum)
    }
  }

  test("WAV codec: encode → decode round-trips exact sample stats, rejects malformed and non-PCM16") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val bytes = Multimodal.MediaCodec.encodeWavPcm16(16000, samples)
    // a genuine RIFF/WAVE container came out
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val Some((rate, n, sum, maxAbs)) = Multimodal.MediaCodec.decodeWav(bytes)
    assert(rate == 16000 && n == samples.length)
    assert(sum == samples.map(_.toLong).sum)
    assert(maxAbs == 32768L) // |-32768| — the asymmetric PCM16 extreme
    // malformed payloads and non-audio bytes skip, never throw
    assert(Multimodal.MediaCodec.decodeWav("not audio".getBytes).isEmpty)
    assert(Multimodal.MediaCodec.decodeWav(bytes.take(16)).isEmpty)
  }

  test("wavFromDocuments: decoded stats match the closed-form sample function") {
    val stats = Multimodal.decodeAudioStats(
      Multimodal.wavFromDocuments(spark, sf))
      .filter(_.media_id < 20).collect().sortBy(_.media_id)
    assert(stats.length == 20)
    stats.foreach { s =>
      val id = s.media_id
      val n = (64 + id % 33).toInt
      assert(s.sample_rate == 8000 + (id % 3) * 4000)
      assert(s.n_samples == n)
      val vs = (0 until n).map(i => ((id * 7919 + i.toLong * 104729) % 65536) - 32768)
      assert(s.sum_samples == vs.sum)
      assert(s.max_abs == vs.map(math.abs).max)
    }
  }

  test("resize: identity dims reproduce the original stats; downscale picks the NN-mapped pixels") {
    val media = Multimodal.pngFromDocuments(spark, sf)
    // identity resize == plain decode for a couple of known shapes
    // (ids with w=5,h=4: id%5==1 && id%3==1 → e.g. id 16? 16%5=1,16%3=1)
    val orig = Multimodal.decodeImageStats(media)
      .filter(_.media_id < 30).collect().map(s => s.media_id -> s).toMap
    orig.values.filter(s => s.width == 5 && s.height == 4).take(3).foreach { s =>
      val same = Multimodal.resizedImageStats(
          media.filter(_.media_id == s.media_id), s.width, s.height)
        .collect().head
      assert((same.sum_r, same.sum_g, same.sum_b) == (s.sum_r, s.sum_g, s.sum_b))
    }
    // downscale to 1x1 == exactly the (0,0) source pixel of each image
    val one = Multimodal.resizedImageStats(media, 1, 1)
      .filter(_.media_id < 10).collect()
    one.foreach { s =>
      val id = s.media_id
      assert(s.sum_r == (id * 31) % 256 && s.sum_g == (id * 17) % 256 &&
        s.sum_b == (id * 23) % 256)
    }
  }

  test("aHash: a one-pixel edit lands within a few bits; an unrelated image sits far; bit packing matches a hand recompute") {
    import spark.implicits._
    // 16x16 source with a smooth-ish deterministic pattern
    def base(x: Int, y: Int): Int = {
      val v = (x * 13 + y * 29) % 256
      (v << 16) | (v << 8) | v
    }
    val orig = Multimodal.MediaCodec.encodePng(16, 16, base)
    // near-dup: ONE source pixel blacked out at a SAMPLED coordinate —
    // the 16→8 downsample reads only even source coords (sx = 2x), so
    // the edit must land on one to move any bit at all; (4,4) is
    // sample (2,2). At most that bit plus a few mean-shift borderline
    // bits can flip
    val edited = Multimodal.MediaCodec.encodePng(16, 16,
      (x, y) => if (x == 4 && y == 4) 0x000000 else base(x, y))
    // unrelated: an inverted checker — wildly different bit pattern
    val other = Multimodal.MediaCodec.encodePng(16, 16,
      (x, y) => if ((x + y) % 2 == 0) 0xFFFFFF else 0x000000)
    val rows = Seq(
      Multimodal.MediaRecord(1L, orig, "image/png", "mem://a", None, None, None),
      Multimodal.MediaRecord(2L, edited, "image/png", "mem://b", None, None, None),
      Multimodal.MediaRecord(3L, other, "image/png", "mem://c", None, None, None)
    ).toDS()
    val h = Multimodal.imageAHash(rows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(1) | (r.getLong(2) << 32))))
      .toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val dNear = hamming(h(1L)._2, h(2L)._2)
    val dFar = hamming(h(1L)._2, h(3L)._2)
    // >= 1: the edit demonstrably moved a bit (a vacuous identical-
    // hash comparison would not exercise the tolerance at all)
    assert(dNear >= 1 && dNear <= 6, s"one-pixel edit moved $dNear bits")
    assert(dFar >= 16, s"unrelated image only $dFar bits away")
    // n_set consistency: the packed word's popcount IS n_set
    h.values.foreach { case (nSet, bits) =>
      assert(java.lang.Long.bitCount(bits).toLong == nSet)
    }
    // hand recompute for the original: identity 16->8 resize picks
    // even source pixels (x*16/8 = 2x), gray == v by construction
    val grays = for (y <- 0 until 8; x <- 0 until 8)
      yield ((2 * x) * 13 + (2 * y) * 29) % 256
    val mean = grays.map(_.toLong).sum / 64
    val expected = grays.zipWithIndex
      .filter { case (g, _) => g > mean }
      .foldLeft(0L) { case (acc, (_, i)) => acc | (1L << i) }
    assert(h(1L)._2 == expected)
  }

  test("audio energy profile: bands partition the stream (sum of bands == total |s| energy)") {
    val media = Multimodal.wavFromDocuments(spark, sf)
    val profiles = Multimodal.audioEnergyProfile(media)
      .filter("media_id < 20").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(profiles.size == 20)
    profiles.foreach { case (id, bands) =>
      assert(bands.length == 8)
      val n = (64 + id % 33).toInt
      val total = (0 until n).map(i =>
        math.abs(((id * 7919 + i.toLong * 104729) % 65536) - 32768)).sum
      assert(bands.sum == total, s"media $id: band sums must conserve energy")
    }
  }

  test("animated GIF codec: encode → per-frame decode round-trips exact pixel sums in frame order") {
    // hand case: 3 frames, distinct closed-form pixels, < 256 colors
    val (w, h, n) = (4, 3, 3)
    def px(f: Int, x: Int, y: Int): Int = {
      val r = (f * 50 + x * 7 + y * 13) % 256
      val g = (f * 60 + x * 11 + y * 3) % 256
      val b = (f * 70 + x * 5 + y * 19) % 256
      (r << 16) | (g << 8) | b
    }
    val bytes = Multimodal.MediaCodec.encodeAnimatedGif(w, h, n, px)
    assert(new String(bytes.slice(0, 3), "US-ASCII") == "GIF")
    val Some(frames) = Multimodal.MediaCodec.decodeGifFrames(bytes)
    assert(frames.length == n)
    frames.zipWithIndex.foreach { case ((fw, fh, sr, sg, sb), f) =>
      assert((fw, fh) == (w, h))
      val expected = for { x <- 0 until w; y <- 0 until h } yield
        ((f * 50 + x * 7 + y * 13) % 256,
         (f * 60 + x * 11 + y * 3) % 256,
         (f * 70 + x * 5 + y * 19) % 256)
      assert(sr == expected.map(_._1).sum, s"frame $f red")
      assert(sg == expected.map(_._2).sum, s"frame $f green")
      assert(sb == expected.map(_._3).sum, s"frame $f blue")
    }
    // malformed payloads skip, never throw
    assert(Multimodal.MediaCodec.decodeGifFrames("not a gif".getBytes).isEmpty)
  }

  test("gifFromDocuments: per-frame decoded stats match the closed-form pixel function") {
    val stats = Multimodal.gifFrameStats(Multimodal.gifFromDocuments(spark, sf))
      .filter("media_id < 15").collect()
      .groupBy(_.getLong(0))
    assert(stats.size == 15)
    stats.foreach { case (id, rows) =>
      val frames = (2 + id % 3).toInt
      val w = (3 + id % 4).toInt
      val h = (3 + id % 2).toInt
      assert(rows.length == frames, s"media $id frame count")
      rows.sortBy(_.getLong(1)).zipWithIndex.foreach { case (r, f) =>
        assert(r.getLong(1) == f && r.getInt(2) == w && r.getInt(3) == h)
        val exp = for { x <- 0 until w; y <- 0 until h } yield
          ((id * 29 + f * 41 + x * 7 + y * 13) % 256,
           (id * 37 + f * 43 + x * 11 + y * 3) % 256,
           (id * 41 + f * 47 + x * 5 + y * 19) % 256)
        assert(r.getLong(4) == exp.map(_._1).sum, s"media $id frame $f r")
        assert(r.getLong(5) == exp.map(_._2).sum, s"media $id frame $f g")
        assert(r.getLong(6) == exp.map(_._3).sum, s"media $id frame $f b")
      }
    }
  }

  test("image histogram: dense per-channel bin counts equal the closed-form recompute") {
    val media = Multimodal.pngFromDocuments(spark, sf)
    val out = Multimodal.imageHistogram(media, bins = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val ids = media.select("media_id").collect().map(_.getLong(0))
    ids.filter(_ < 20).foreach { id =>
      val w = (4 + id % 5).toInt
      val h = (4 + id % 3).toInt
      val exp = scala.collection.mutable.Map[(String, Long), Long]()
        .withDefaultValue(0L)
      for (x <- 0 until w; y <- 0 until h) {
        exp(("r", (id * 31 + x * 7 + y * 13) % 256 / 64)) += 1
        exp(("g", (id * 17 + x * 11 + y * 3) % 256 / 64)) += 1
        exp(("b", (id * 23 + x * 5 + y * 19) % 256 / 64)) += 1
      }
      for (c <- Seq("r", "g", "b"); b <- 0L until 4L) {
        assert(out((id, c, b)) == exp((c, b)),
          s"media $id channel $c bin $b")
      }
      // dense: every (channel, bin) cell present, counts sum to pixels
      assert(Seq("r", "g", "b").forall(c =>
        (0L until 4L).map(b => out((id, c, b))).sum == w * h))
    }
  }

  test("GIF frame sampling keeps stride-th frames with order-sensitive pixel fingerprints") {
    val media = Multimodal.gifFromDocuments(spark, sf)
    val out = Multimodal.sampleGifFrames(media, stride = 2).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(1)).forall(_ % 2 == 0), "non-stride frame kept")
    // fingerprint equals the polynomial fold over the closed-form
    // pixels in row-major order — an independent recompute, and a
    // pixel-ORDER check (channel sums cannot catch a permutation)
    out.filter(_.getLong(0) < 20).foreach { r =>
      val (id, f) = (r.getLong(0), r.getLong(1))
      val w = (3 + id % 4).toInt
      val h = (3 + id % 2).toInt
      assert(r.getInt(2) == w && r.getInt(3) == h)
      var fp = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = (((id * 29 + f * 41 + x * 7 + y * 13) % 256) << 16) |
          (((id * 37 + f * 43 + x * 11 + y * 3) % 256) << 8) |
          ((id * 41 + f * 47 + x * 5 + y * 19) % 256)
        fp = (fp * 31L + p) % 2147483647L
      }
      assert(r.getLong(4) == fp, s"media $id frame $f fingerprint")
    }
  }

  test("binaryFile ingestion: real files on disk round-trip through the binary source to exact stats") {
    val dir = Multimodal.pngFileFixture(spark, sf)
    assert(new java.io.File(dir, "_SUCCESS").isFile)
    // memoized: a second call must return the same directory, not rebuild
    assert(Multimodal.pngFileFixture(spark, sf) == dir)
    val stats = Multimodal.imageStatsFromFiles(spark, dir)
      .filter(_.media_id < 10).collect().sortBy(_.media_id)
    assert(stats.length == 10)
    stats.foreach { s =>
      val id = s.media_id
      val (w, h) = ((4 + id % 5).toInt, (4 + id % 3).toInt)
      assert((s.width, s.height) == (w, h))
      val expected = for { x <- 0 until w; y <- 0 until h } yield
        ((id * 31 + x * 7 + y * 13) % 256,
         (id * 17 + x * 11 + y * 3) % 256,
         (id * 23 + x * 5 + y * 19) % 256)
      assert(s.sum_r == expected.map(_._1).sum)
      assert(s.sum_g == expected.map(_._2).sum)
      assert(s.sum_b == expected.map(_._3).sum)
    }
  }

  test("codec fixture stages spread across the full core count, not the file-split count") {
    // The documents table is one parquet split at test SFs; codec
    // encode/decode cost is per-row CPU, so the fixture generators must
    // not inherit that single partition (Multimodal.spreadForCodec).
    val par = spark.sparkContext.defaultParallelism
    Seq(
      Multimodal.pngFromDocuments(spark, sf),
      Multimodal.wavFromDocuments(spark, sf),
      Multimodal.gifFromDocuments(spark, sf)
    ).foreach { ds =>
      assert(ds.rdd.getNumPartitions == par,
        s"codec stage runs in ${ds.rdd.getNumPartitions} partition(s); " +
          s"expected $par — decode parallelism must be decoupled from file splits")
    }
  }
}
