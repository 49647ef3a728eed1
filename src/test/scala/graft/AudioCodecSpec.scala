package graft

import graft.operators.{AudioCodec, Multimodal, MultimodalStub}

class AudioCodecSpec extends SparkSuite {

  test("WAV encode/decode round-trips every PCM sample exactly") {
    val rate = 11025
    val samples = Array.tabulate(200)(t => ((t * 31 - 3000) % 32768).toShort)
    val bytes = AudioCodec.encodePcm16Wav(rate, samples)
    // real WAV: RIFF....WAVE magic
    assert(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')
    assert(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')
    val clip = AudioCodec.decodePcm(bytes).get
    assert(clip.sampleRate == rate && clip.channels == 1)
    assert(clip.nSamples == samples.length)
    for (t <- samples.indices) assert(clip.samples(t) == samples(t).toInt)
    assert(clip.sumPcm == samples.map(_.toLong).sum)
    assert(clip.sumAbsPcm == samples.map(s => math.abs(s.toLong)).sum)
  }

  test("decodePcm returns None for non-audio payloads (dispatch boundary)") {
    assert(AudioCodec.decodePcm(Array[Byte](1, 2, 3)).isEmpty)
    assert(AudioCodec.decodePcm("plain text payload".getBytes("UTF-8")).isEmpty)
    // a PNG is not audio, and vice versa (disjoint magics keep the
    // extractFeatures dispatch order irrelevant for real payloads)
    val png = graft.operators.ImageCodec.encodeGrayPng(4, 4, (x, y) => x + y)
    assert(AudioCodec.decodePcm(png).isEmpty)
    val wav = AudioCodec.encodePcm16Wav(8000, Array.tabulate(16)(_.toShort))
    assert(graft.operators.ImageCodec.decodeGray(wav).isEmpty)
  }

  test("decodePcm returns None for a recognized header with a corrupt body") {
    val good = AudioCodec.encodePcm16Wav(8000, Array.tabulate(64)(t => (t * 100).toShort))
    // truncated mid-header: reader recognizes RIFF, then throws
    assert(AudioCodec.decodePcm(good.take(16)).isEmpty)
  }

  test("wavAssets payloads are real WAVs matching the declared sample formula") {
    val assets = Multimodal.wavAssets(spark, sfDir).collect()
    assert(assets.nonEmpty)
    assert(assets.forall(_.modality == "audio"))
    assets.take(5).foreach { a =>
      val clip = AudioCodec.decodePcm(a.payload).get
      assert(clip.sampleRate == Multimodal.wavSampleRate(a.asset_id))
      assert(clip.nSamples == Multimodal.wavNumSamples(a.asset_id))
      for (t <- 0 until clip.nSamples)
        assert(clip.samples(t) == Multimodal.wavSample(a.asset_id)(t).toInt)
    }
  }

  test("extractFeatures dispatches the real audio codec for WAVs") {
    val wavs = Multimodal.wavAssets(spark, sfDir).limit(4)
    val feats = Multimodal.extractFeatures(wavs).collect()
    val byId = wavs.collect().map(a => a.asset_id -> a).toMap
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val a = byId(f.asset_id)
      val clip = AudioCodec.decodePcm(a.payload).get
      // real path: features come from decoded samples, not payload bytes
      assert(f.features.toSeq == AudioCodec.audioFeatures(clip, 8).toSeq)
      assert(f.features.toSeq != MultimodalStub.decodeToFeatures(a.payload, 8).toSeq)
    }
  }

  test("m_audio_decode agrees with a driver-side sample simulation") {
    val rows = Multimodal.mAudioDecode(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == Multimodal.wavSampleRate(id))
      val n = Multimodal.wavNumSamples(id)
      assert(r.getLong(2) == n.toLong)
      val sim = (0 until n).map(t => Multimodal.wavSample(id)(t).toLong)
      assert(r.getLong(3) == sim.sum)
      assert(r.getLong(4) == sim.map(math.abs).sum)
    }
  }
}
