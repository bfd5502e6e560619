package graft

import graft.operators.{ImageCodec, MediaRecord, MultimodalStub}

/** The REAL javax.imageio codec path must be pixel-lossless through
  * the PNG round-trip, dispatch non-PNG bytes to the stub fallback,
  * and demux the multi-frame container exactly.
  */
class ImageCodecSpec extends SparkSpec {
  import spark.implicits._

  test("grayscale PNG round-trip is pixel-exact for random dims/seeds") {
    val rng = new scala.util.Random(94)
    for (_ <- 1 to 20) {
      val w = 1 + rng.nextInt(40); val h = 1 + rng.nextInt(30)
      val seed = rng.nextLong() & Long.MaxValue
      val png = ImageCodec.synthGrayPng(seed, w, h)
      assert(ImageCodec.isPng(png))
      val d = ImageCodec.decodeGray(seed, png)
      assert(d.width === w && d.height === h && d.n_pixels === w.toLong * h)
      var sum = 0L; var mn = 256; var mx = -1
      for (y <- 0 until h; x <- 0 until w) {
        val p = ImageCodec.synthPixel(seed, x, y)
        sum += p; mn = math.min(mn, p); mx = math.max(mx, p)
      }
      assert(d.px_sum === sum, s"sum for seed=$seed w=$w h=$h")
      assert(d.px_min === mn && d.px_max === mx)
    }
  }

  test("frame container packs and unpacks byte-exact") {
    val frames = Seq(
      ImageCodec.synthGrayPng(1L, 3, 2),
      ImageCodec.synthGrayPng(2L, 5, 4),
      Array[Byte](1, 2, 3))
    val unpacked = ImageCodec.unpackFrames(ImageCodec.packFrames(frames))
    assert(unpacked.size === 3)
    frames.zip(unpacked).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    assert(ImageCodec.unpackFrames(ImageCodec.packFrames(Nil)).isEmpty)
  }

  test("decodeImages runs the real codec distributed; non-PNG falls back") {
    val recs = Seq(
      MediaRecord(1L, 1, ImageCodec.synthGrayPng(1L, 4, 3)),
      MediaRecord(2L, 1, ImageCodec.synthGrayPng(2L, 6, 5)),
      MediaRecord(3L, 0, "not an image".getBytes("UTF-8")))
    val got = ImageCodec.decodeImages(spark.createDataset(recs).repartition(3))
      .collect().map(d => d.doc_id -> d).toMap
    assert(got(1L).n_pixels === 12L && got(2L).n_pixels === 30L)
    assert(got(1L).px_sum > 0L)
    // fallback: stub dims, zeroed pixel stats (quarantine semantics)
    val fake = MultimodalStub.fakeDecode(recs(2))
    assert(got(3L).width === fake.width && got(3L).height === fake.height)
    assert(got(3L).n_pixels === 0L && got(3L).px_sum === 0L)
  }

  test("sampleFrames decodes every stride-th frame with exact sums") {
    val id = 7L
    val frames = (0 until 5).map(f => ImageCodec.synthGrayPng(id * 31 + f, 3, 2))
    val recs = Seq(MediaRecord(id, 2, ImageCodec.packFrames(frames)))
    val got = ImageCodec.sampleFrames(spark.createDataset(recs), 2)
      .collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq === Seq(0, 2, 4))
    got.foreach { fr =>
      assert(fr.n_frames === 5 && fr.width === 3 && fr.height === 2)
      val seed = id * 31 + fr.frame_idx
      val want = (for (y <- 0 until 2; x <- 0 until 3)
        yield ImageCodec.synthPixel(seed, x, y).toLong).sum
      assert(fr.px_sum === want)
    }
  }

  test("jpegAudit: real lossy decode — dims exact, PNG roundtrip exact, MAE bounded") {
    val rng = new scala.util.Random(297)
    val recs = (1 to 25).map { _ =>
      val id = rng.nextLong() & Long.MaxValue
      val w = (id % 9 + 8).toInt; val h = (id % 5 + 8).toInt
      val jpg = ImageCodec.synthSmoothGrayJpeg(id, w, h)
      assert(ImageCodec.isJpeg(jpg) && !ImageCodec.isPng(jpg))
      MediaRecord(id, 1, jpg)
    }
    val out = ImageCodec.jpegAudit(recs.toDS(),
      graft.queries.LlmText.JPEG_MAE_TOL_MILLI).collect()
    assert(out.length === recs.size)
    out.foreach { a =>
      assert(a.width === (a.doc_id % 9 + 8).toInt)
      assert(a.height === (a.doc_id % 5 + 8).toInt)
      assert(a.is_jpeg && a.png_roundtrip_exact && a.mae_le_tol,
        s"doc_id=${a.doc_id}")
    }
    // the bound is not vacuous: a deliberately wrong formula seed fails it
    val wrongSeed = ImageCodec.jpegAudit(
      Seq(MediaRecord(12L, 1,
        ImageCodec.synthSmoothGrayJpeg(55L, 17, 13))).toDS(),
      graft.queries.LlmText.JPEG_MAE_TOL_MILLI).collect().head
    assert(!wrongSeed.mae_le_tol, "MAE bound should catch a wrong synthesis seed")
    // non-JPEG bytes degrade loudly-but-deterministically
    val png = ImageCodec.jpegAudit(
      Seq(MediaRecord(3L, 1, ImageCodec.synthGrayPng(3L, 4, 4))).toDS(),
      graft.queries.LlmText.JPEG_MAE_TOL_MILLI).collect().head
    assert(!png.is_jpeg && !png.png_roundtrip_exact && !png.mae_le_tol)
  }

  test("resizeHalf samples even coordinates and survives re-encode") {
    import graft.operators.{ImageCodec, MediaRecord}
    for (seed <- Seq(1L, 5L, 42L); (w, h) <- Seq((7, 5), (8, 4), (1, 1))) {
      val png = ImageCodec.synthGrayPng(seed, w, h)
      val r = ImageCodec.resizeHalf(seed, png)
      val w2 = (w + 1) / 2; val h2 = (h + 1) / 2
      assert(r.width === w2 && r.height === h2 && r.n_pixels === w2.toLong * h2)
      val px = for (y <- 0 until h2; x <- 0 until w2)
        yield ImageCodec.synthPixel(seed, 2 * x, 2 * y)
      assert(r.px_sum === px.map(_.toLong).sum)
      assert(r.px_min === px.min && r.px_max === px.max)
    }
  }
}
