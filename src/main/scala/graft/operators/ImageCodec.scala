package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real image codec behind the multimodal decode boundary
  * (ref: the reference treats attachments as opaque blobs —
  * `backend/src/services/memory_service.py` stores payloads untyped;
  * the decode/feature mandate is the north-star addition).
  *
  * 8-bit grayscale PNG via `javax.imageio` — present in every JDK 17,
  * lossless, and byte-exact on round-trip (verified: TYPE_BYTE_GRAY
  * samples written are the samples read back). This replaces the
  * declared stub for the image modality; audio/video remain stubbed
  * ([[MultimodalStub]]) because the JDK ships no codec for them.
  *
  * Scale notes: encode/decode are pure per-row CPU inside
  * `mapPartitions` — no shuffle touches a payload, no driver
  * involvement, and the working set per task is one decoded raster
  * (≤ a few MB for real images). On a 1000-executor cluster this is
  * embarrassingly parallel; the only cluster-visible cost is the
  * binary column's scan width, which metadata-only queries avoid via
  * column pruning (see [[Multimodal.modalityStats]]). */
object ImageCodec {

  /** Encode a `w`×`h` grayscale image, `pixel(x, y)` ∈ [0, 255]. */
  def encodeGrayPng(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixel(x, y) & 0xff); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decoded grayscale raster, samples row-major. */
  final case class GrayImage(width: Int, height: Int, samples: Array[Int]) {
    def apply(x: Int, y: Int): Int = samples(y * width + x)
    def sumLum: Long = {
      var s = 0L; var i = 0
      while (i < samples.length) { s += samples(i); i += 1 }
      s
    }
  }

  // per-row decodes must never touch executor /tmp: ImageIO's default
  // stream cache backs every read with a temp FILE, an fsync-able I/O
  // per payload that also leaks on crash — keep it in memory
  ImageIO.setUseCache(false)

  /** Real decode: `ImageIO.read` (PNG/JPEG/BMP/GIF — whatever the JDK
    * registry knows). `None` for payloads no reader recognizes OR for
    * recognized-format headers with corrupt/truncated bodies (ImageIO
    * throws there, not returns null), so callers dispatch real-vs-stub
    * without one bad row crashing a whole feature-extract job. Reads
    * samples from the raster (band 0), never through an RGB conversion,
    * so gray PNGs round-trip bit-exact. */
  def decodeGray(payload: Array[Byte]): Option[GrayImage] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else
      try {
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Int](w * h)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        Some(GrayImage(w, h, out))
      } catch { // exotic-but-recognized rasters (0 bands, absurd dims)
        case scala.util.control.NonFatal(_) => None
      }
  }

  /** Nearest-neighbor downsample: `out(x, y) = in(x·factor, y·factor)`,
    * output dims `ceil(dim / factor)`. Deterministic (unlike area
    * averaging, whose rounding an external oracle can't reproduce) —
    * the resize round-trip query is exactly-checkable end to end. */
  def resizeNearest(img: GrayImage, factor: Int): GrayImage = {
    require(factor >= 1)
    val w2 = (img.width + factor - 1) / factor
    val h2 = (img.height + factor - 1) / factor
    val out = new Array[Int](w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) { out(y * w2 + x) = img(x * factor, y * factor); x += 1 }
      y += 1
    }
    GrayImage(w2, h2, out)
  }

  /** Pooled luminance features from a REAL decoded raster: mean of
    * `featureDim` contiguous sample windows, normalized to [0, 1] —
    * the real-codec replacement for [[MultimodalStub.decodeToFeatures]]
    * (same output contract, pixel-domain input). */
  def imageFeatures(img: GrayImage, featureDim: Int): Array[Float] = {
    val out = new Array[Float](featureDim)
    val n = img.samples.length
    if (n == 0) return out
    val window = math.max(1, n / featureDim)
    var i = 0
    while (i < featureDim) {
      var sum = 0L
      var cnt = 0
      var j = i * window
      val end = math.min(n, (i + 1) * window)
      while (j < end) { sum += img.samples(j); cnt += 1; j += 1 }
      out(i) = if (cnt == 0) 0f else sum.toFloat / cnt / 255f
      i += 1
    }
    out
  }
}
