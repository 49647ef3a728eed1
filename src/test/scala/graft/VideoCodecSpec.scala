package graft

import graft.operators.{Multimodal, VideoCodec}

class VideoCodecSpec extends SparkSuite {

  test("animated GIF encode/decode round-trips every frame pixel-exact") {
    val (w, h, n) = (9, 7, 5)
    def pix(f: Int, x: Int, y: Int): Int = (x * y + 13 * f + 41) % 256
    val bytes = VideoCodec.encodeGrayGif(w, h, n, pix)
    // real GIF: magic bytes
    assert(bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
    val (total, frames) = VideoCodec.decodeFrames(bytes).get
    assert(total == n && frames.size == n)
    frames.foreach { case (f, img) =>
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) assert(img(x, y) == pix(f, x, y))
    }
  }

  test("stride sampling keeps frames 0, s, 2s, … and reports the full count") {
    def pix(f: Int, x: Int, y: Int): Int = (x + y + f) % 256
    val bytes = VideoCodec.encodeGrayGif(4, 4, 7, pix)
    val (total, frames) = VideoCodec.decodeFrames(bytes, stride = 3).get
    assert(total == 7)
    assert(frames.map(_._1) == Seq(0, 3, 6))
  }

  test("decodeFrames returns None for non-GIF and corrupt payloads") {
    assert(VideoCodec.decodeFrames("not a gif".getBytes("UTF-8")).isEmpty)
    // PNG is not a GIF — the modality dispatch stays unambiguous
    val png = graft.operators.ImageCodec.encodeGrayPng(4, 4, (x, y) => x + y)
    assert(VideoCodec.decodeFrames(png).isEmpty)
    // recognized GIF magic, truncated body
    val good = VideoCodec.encodeGrayGif(8, 8, 3, (f, x, y) => (x * y + f) % 256)
    assert(VideoCodec.decodeFrames(good.take(16)).isEmpty)
  }

  test("gifAssets payloads are real GIFs matching the declared frame formula") {
    val assets = Multimodal.gifAssets(spark, sfDir).collect()
    assert(assets.nonEmpty)
    assert(assets.forall(_.modality == "video"))
    assets.take(4).foreach { a =>
      val (total, frames) = VideoCodec.decodeFrames(a.payload).get
      assert(total == Multimodal.gifFrameCount(a.asset_id))
      val (w, h) = Multimodal.gifDims(a.asset_id)
      frames.foreach { case (f, img) =>
        assert(img.width == w && img.height == h)
        for (y <- 0 until h; x <- 0 until w)
          assert(img(x, y) == Multimodal.gifPixel(a.asset_id)(f, x, y))
      }
    }
  }

  test("m_video_frames agrees with a driver-side frame simulation") {
    val rows = Multimodal.mVideoFrames(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val n = Multimodal.gifFrameCount(id)
      assert(r.getLong(1) == n.toLong)
      val sampled = 0 until n by 2
      assert(r.getLong(2) == sampled.size.toLong)
      val (w, h) = Multimodal.gifDims(id)
      val expected = (for (f <- sampled; y <- 0 until h; x <- 0 until w)
        yield Multimodal.gifPixel(id)(f, x, y).toLong).sum
      assert(r.getLong(3) == expected)
    }
  }
}
