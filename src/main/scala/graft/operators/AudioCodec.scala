package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real audio codec behind the multimodal decode boundary — the second
  * modality to graduate from declared stub to JDK-native code (image
  * went first via `javax.imageio`; ref: the reference treats attachments
  * as opaque blobs — `backend/src/services/memory_service.py` stores
  * payloads untyped; decode/feature mandates are north-star additions).
  *
  * 16-bit signed PCM mono WAV via `javax.sound.sampled` — present in
  * every JDK 17, lossless, and sample-exact on round-trip (PCM is raw
  * samples behind a RIFF header; what is written is what is read).
  * Video remains stubbed ([[MultimodalStub]]): the JDK ships no video
  * codec, so that boundary stays a deterministic fake with real Spark
  * plumbing around it.
  *
  * Scale notes: identical posture to [[ImageCodec]] — encode/decode are
  * pure per-row CPU inside `mapPartitions`, payloads never shuffle, the
  * per-task working set is one decoded clip. Embarrassingly parallel on
  * a 1000-executor cluster. */
object AudioCodec {

  /** Encode mono 16-bit signed little-endian PCM as a WAV container. */
  def encodePcm16Wav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1,
      /* signed = */ true, /* bigEndian = */ false)
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decoded PCM clip, samples interleaved by channel. */
  final case class PcmClip(sampleRate: Int, channels: Int, samples: Array[Int]) {
    def nSamples: Int = samples.length
    def sumPcm: Long = {
      var s = 0L; var i = 0
      while (i < samples.length) { s += samples(i); i += 1 }
      s
    }
    def sumAbsPcm: Long = {
      var s = 0L; var i = 0
      while (i < samples.length) { s += math.abs(samples(i).toLong); i += 1 }
      s
    }
  }

  /** Real decode: `AudioSystem.getAudioInputStream` (WAV/AIFF/AU —
    * whatever the JDK registry knows), restricted to 16-bit signed PCM.
    * `None` for payloads no reader recognizes (wrong magic), for
    * recognized headers with corrupt/truncated bodies (the reader
    * throws there), and for encodings outside the PCM16 contract — so
    * callers dispatch real-vs-stub without one bad row crashing a
    * whole feature-extract job (same contract as
    * [[ImageCodec.decodeGray]]). */
  def decodePcm(payload: Array[Byte]): Option[PcmClip] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) None
      else {
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        val out = new Array[Int](n)
        val bigEndian = fmt.isBigEndian
        var i = 0
        while (i < n) {
          val b0 = bytes(2 * i)
          val b1 = bytes(2 * i + 1)
          out(i) =
            if (bigEndian) (b0.toInt << 8) | (b1 & 0xff)
            else (b1.toInt << 8) | (b0 & 0xff)
          i += 1
        }
        Some(PcmClip(math.round(fmt.getSampleRate), fmt.getChannels, out))
      }
    } catch { // unrecognized magic OR recognized-but-corrupt body
      case scala.util.control.NonFatal(_) => None
    }

  /** Pooled amplitude features from a REAL decoded clip: mean of
    * `featureDim` contiguous sample windows, shifted/scaled to [0, 1] —
    * the audio twin of [[ImageCodec.imageFeatures]] (same output
    * contract, sample-domain input). */
  def audioFeatures(clip: PcmClip, featureDim: Int): Array[Float] = {
    val out = new Array[Float](featureDim)
    val n = clip.samples.length
    if (n == 0) return out
    val window = math.max(1, n / featureDim)
    var i = 0
    while (i < featureDim) {
      var sum = 0L
      var cnt = 0
      var j = i * window
      val end = math.min(n, (i + 1) * window)
      while (j < end) { sum += clip.samples(j); cnt += 1; j += 1 }
      // 16-bit signed → [0, 1]: (mean + 32768) / 65536
      out(i) = if (cnt == 0) 0f
        else ((sum.toFloat / cnt) + 32768f) / 65536f
      i += 1
    }
    out
  }
}
