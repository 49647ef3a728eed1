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

  test("color-palette GIF decodes to true BT.601 luminance, not the blue channel") {
    // a COLOR GIF (the payload class the pre-guard decoder mis-read):
    // two solid-color frames whose blue channel differs wildly from
    // their luminance — pure red (luma 76, blue 0) and pure yellow
    // (luma 226, blue 0). Few distinct colors, so the GIF writer's
    // palette holds them exactly.
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.{IIOImage, ImageIO}
    val colors = Seq(0xFF0000, 0xFFFF00) // red, yellow
    val (w, h) = (6, 5)
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      colors.foreach { c =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, c)
        writer.writeToSequence(new IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    def luma601(c: Int): Int =
      (299 * ((c >> 16) & 0xff) + 587 * ((c >> 8) & 0xff) + 114 * (c & 0xff)) / 1000
    val (total, frames) = VideoCodec.decodeFrames(bos.toByteArray).get
    assert(total == 2 && frames.size == 2)
    frames.foreach { case (f, img) =>
      val want = luma601(colors(f))
      val blue = colors(f) & 0xff
      assert(want != blue, "test colors must distinguish luma from blue")
      for (y <- 0 until h; x <- 0 until w)
        assert(img(x, y) == want,
          s"frame $f pixel ($x,$y): got ${img(x, y)}, want luma $want (blue-channel bug would give $blue)")
    }
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
