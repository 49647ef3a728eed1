package graft

import graft.operators.{ImageCodec, Multimodal, MultimodalStub}

class ImageCodecSpec extends SparkSuite {

  test("PNG encode/decode round-trips every sample bit-exact") {
    val (w, h) = (13, 9)
    def pix(x: Int, y: Int): Int = (x * y + 37) % 256
    val bytes = ImageCodec.encodeGrayPng(w, h, pix)
    // real PNG: magic bytes
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    val img = ImageCodec.decodeGray(bytes).get
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) assert(img(x, y) == pix(x, y))
    assert(img.sumLum == (for (y <- 0 until h; x <- 0 until w) yield pix(x, y).toLong).sum)
  }

  test("decodeGray returns None for non-image payloads (dispatch boundary)") {
    assert(ImageCodec.decodeGray(Array[Byte](1, 2, 3)).isEmpty)
    assert(ImageCodec.decodeGray("plain text payload".getBytes("UTF-8")).isEmpty)
  }

  test("decodeGray returns None for a recognized header with a corrupt body") {
    // a real PNG truncated mid-stream: ImageIO's reader recognizes the
    // magic, then THROWS on the body — must map to None, not crash a
    // whole feature-extract job on one bad row
    val good = ImageCodec.encodeGrayPng(32, 32, (x, y) => (x + y) % 256)
    val truncated = good.take(24)
    assert(ImageCodec.decodeGray(truncated).isEmpty)
    // corrupted chunk bytes after an intact header
    val mangled = good.clone()
    for (i <- 16 until math.min(64, mangled.length)) mangled(i) = 0x55.toByte
    assert(ImageCodec.decodeGray(mangled).isEmpty)
  }

  test("resizeNearest samples (2x,2y) with ceil-div dims") {
    def pix(x: Int, y: Int): Int = (x + 10 * y) % 256
    val img = ImageCodec.decodeGray(ImageCodec.encodeGrayPng(9, 5, pix)).get
    val small = ImageCodec.resizeNearest(img, 2)
    assert(small.width == 5 && small.height == 3)
    for (y <- 0 until 3; x <- 0 until 5) assert(small(x, y) == pix(2 * x, 2 * y))
  }

  test("pngAssets payloads are real PNGs matching the declared pixel formula") {
    val assets = Multimodal.pngAssets(spark, sfDir).collect()
    assert(assets.nonEmpty)
    assert(assets.forall(_.modality == "image"))
    assets.take(5).foreach { a =>
      val img = ImageCodec.decodeGray(a.payload).get
      val (w, h) = Multimodal.pngDims(a.asset_id)
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img(x, y) == Multimodal.pngPixel(a.asset_id)(x, y))
    }
  }

  test("extractFeatures dispatches real codec for PNGs, stub for text") {
    import spark.implicits._
    val pngs = Multimodal.pngAssets(spark, sfDir).limit(4)
    val feats = Multimodal.extractFeatures(pngs).collect()
    feats.foreach { f =>
      val a = pngs.collect().find(_.asset_id == f.asset_id).get
      val img = ImageCodec.decodeGray(a.payload).get
      // real path: features come from decoded pixels, not payload bytes
      assert(f.features.toSeq == ImageCodec.imageFeatures(img, 8).toSeq)
      assert(f.features.toSeq != MultimodalStub.decodeToFeatures(a.payload, 8).toSeq)
    }
    // text payloads (the stub asset table) still take the stub path
    val textAssets = Multimodal.assetTable(spark, sfDir).limit(4)
    val textFeats = Multimodal.extractFeatures(textAssets).collect()
    textFeats.foreach { f =>
      val a = textAssets.collect().find(_.asset_id == f.asset_id).get
      assert(f.features.toSeq == MultimodalStub.decodeToFeatures(a.payload, 8).toSeq)
    }
  }

  test("m_image_decode agrees with a driver-side pixel simulation") {
    val rows = Multimodal.mImageDecode(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = Multimodal.pngDims(id)
      assert(r.getInt(1) == w && r.getInt(2) == h)
      assert(r.getLong(3) == w.toLong * h)
      val expected = (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.pngPixel(id)(x, y).toLong).sum
      assert(r.getLong(4) == expected)
    }
  }

  test("m_image_resize_roundtrip survives re-encode bit-exact") {
    val rows = Multimodal.mImageResizeRoundtrip(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = Multimodal.pngDims(id)
      val (w2, h2) = ((w + 1) / 2, (h + 1) / 2)
      assert(r.getInt(1) == w2 && r.getInt(2) == h2)
      val expected = (for (y <- 0 until h2; x <- 0 until w2)
        yield Multimodal.pngPixel(id)(2 * x, 2 * y).toLong).sum
      assert(r.getLong(3) == expected)
    }
  }
}
