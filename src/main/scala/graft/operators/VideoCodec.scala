package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}
import java.awt.image.BufferedImage

import graft.operators.ImageCodec.GrayImage

/** Real multi-frame (video-modality) codec behind the multimodal decode
  * boundary — the third and last modality to graduate from declared
  * stub to JDK-native code (image: `javax.imageio` PNG; audio:
  * `javax.sound.sampled` WAV; ref: the reference treats attachments as
  * opaque blobs — `backend/src/services/memory_service.py` stores
  * payloads untyped; decode/frame-sample mandates are north-star
  * additions).
  *
  * Animated GIF via `javax.imageio`'s sequence API — present in every
  * JDK 17 and the one JDK-native moving-picture container. Frames are
  * read back through `getRGB` (palette-resolved ARGB — raster band 0
  * would return palette indices) and reduced to BT.601 integer luma
  * `(299·r + 587·g + 114·b) div 1000`. For a GRAY palette r=g=b=v and
  * the formula collapses to exactly v, so grayscale frames round-trip
  * bit-exact; for a COLOR palette it yields true luminance instead of
  * silently reading one channel (reading `rgb & 0xff` — the pre-guard
  * code — returned the BLUE channel for color payloads: plausible-wrong
  * features, the worst failure class). There is no JDK codec for real
  * inter-frame-compressed video (H.264 etc.); that boundary would be an
  * FFI swap with the same signatures.
  *
  * Scale notes: identical posture to [[ImageCodec]]/[[AudioCodec]] —
  * encode/decode are pure per-row CPU inside `mapPartitions`, payloads
  * never shuffle, the per-task working set is one decoded frame set.
  * Frame sampling (every k-th frame) happens at decode, so unsampled
  * frames are dropped inside the partition, exactly where a keyframe
  * extractor would run. */
object VideoCodec {

  /** Encode `nFrames` grayscale frames, `pixel(f, x, y)` ∈ [0, 255],
    * as one animated GIF. */
  def encodeGrayGif(w: Int, h: Int, nFrames: Int,
      pixel: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0, s"bad dims ${w}x$h x$nFrames")
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, pixel(f, x, y) & 0xff); x += 1 }
          y += 1
        }
        writer.writeToSequence(new IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Real decode of every `stride`-th frame (0, stride, 2·stride, …).
    * `None` for payloads the GIF reader does not recognize or whose
    * body is corrupt/truncated — same dispatch contract as
    * [[ImageCodec.decodeGray]] / [[AudioCodec.decodePcm]]. Also returns
    * the TOTAL frame count, so samplers can account for what they
    * skipped. */
  def decodeFrames(payload: Array[Byte], stride: Int = 1)
      : Option[(Int, Seq[(Int, GrayImage)])] = {
    require(stride >= 1)
    try {
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        if (n <= 0) None
        else {
          val frames = (0 until n by stride).map { f =>
            val img = reader.read(f)
            val w = img.getWidth
            val h = img.getHeight
            val out = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              // getRGB: palette-resolved ARGB → BT.601 integer luma.
              // Gray palettes (r=g=b=v) reduce to exactly v (bit-exact
              // round-trip); color palettes get true luminance, never a
              // single channel masquerading as one.
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val r = (rgb >> 16) & 0xff
                val g = (rgb >> 8) & 0xff
                val b = rgb & 0xff
                out(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
                x += 1
              }
              y += 1
            }
            f -> GrayImage(w, h, out)
          }
          Some((n, frames))
        }
      } finally {
        reader.dispose()
        iis.close()
      }
    } catch { // wrong magic OR recognized-but-corrupt body
      case scala.util.control.NonFatal(_) => None
    }
  }
}
