package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star mandate, SURVEY §2.D): treat
  * image/audio/video payloads as opaque `BinaryType` columns with typed
  * metadata, and run decode / feature-extract / resize / frame-sample as
  * partition-batched functions.
  *
  * All three decode paths are REAL JDK codecs. IMAGE: `javax.imageio`
  * PNG encode/decode/resize via [[ImageCodec]] ([[Multimodal.pngAssets]]
  * and the `m_image_*` queries — pixel-exact, oracle-checked). AUDIO:
  * `javax.sound.sampled` WAV PCM16 via [[AudioCodec]]
  * ([[Multimodal.wavAssets]], `m_audio_decode` — sample-exact,
  * oracle-checked). VIDEO (multi-frame): `javax.imageio` animated GIF
  * via [[VideoCodec]] ([[Multimodal.gifAssets]], `m_video_frames` —
  * frame-pixel-exact, oracle-checked); inter-frame-compressed formats
  * (H.264 …) have no JDK codec and would be an FFI swap with the same
  * signatures — [[MultimodalStub]] stays as the fallback for payloads
  * no codec recognizes, so the Spark-side plumbing — schema, batching,
  * partitioning, output shape — is exercised for every row either way.
  * [[Multimodal.extractFeatures]] dispatches per row: a payload
  * `ImageIO` recognizes takes the real image path (for a GIF that is
  * its first frame — thumbnail features), a PCM16 container
  * `AudioSystem` recognizes takes the real audio path, anything else
  * falls back to the stub.
  *
  * Scale notes: payloads never enter a shuffle — asset rows are
  * processed map-side with `mapPartitions`, metadata-only projections
  * shuffle. Batch shape mirrors a pandas-UDF/Arrow pipeline: the
  * iterator is consumed in [[Multimodal.BatchSize]]-row groups so a
  * vectorized decoder (or GPU) gets real batches, not single rows. */
object Multimodal {

  val BatchSize = 64

  /** Typed asset row: opaque payload + structured metadata. */
  final case class Asset(
      asset_id: Long,
      modality: String, // image | audio | video
      format: String, // png | wav | mp4 ... (stub values)
      payload: Array[Byte],
      meta: Map[String, String])

  final case class AssetFeatures(
      asset_id: Long,
      modality: String,
      n_bytes: Long,
      checksum: String,
      features: Array[Float])

  /** Build an asset table from `documents` (the container has no real
    * media, so document text stands in as payload bytes; modality/format
    * assigned deterministically by doc_id). */
  def assetTable(s: SparkSession, dir: String): Dataset[Asset] = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(
        $"doc_id".as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          ($"doc_id" % 3 + 1).cast("int")).as("modality"),
        element_at(array(lit("png"), lit("wav"), lit("mp4")),
          ($"doc_id" % 3 + 1).cast("int")).as("format"),
        $"text".cast("binary").as("payload"),
        map(lit("source"), $"source", lit("lang"), $"lang").as("meta"))
      .as[Asset]
  }

  /** Decode + feature-extract over partition-local batches. Image
    * payloads that `ImageIO` recognizes decode for REAL
    * ([[ImageCodec.decodeGray]] → pooled-luminance features); PCM16
    * containers `AudioSystem` recognizes decode for real too
    * ([[AudioCodec.decodePcm]] → pooled-amplitude features);
    * unrecognized payloads (video stubs, text stand-ins) fall back to
    * [[MultimodalStub.decodeToFeatures]]. Everything around the codec —
    * batching, schema, partition shape — is production code either
    * way. Image is probed first: PNG and RIFF magics are disjoint, so
    * order never flips a real payload to the wrong codec. */
  def extractFeatures(assets: Dataset[Asset], featureDim: Int = 8): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // batch boundary = what a vectorized decoder would receive
        batch.iterator.map { a =>
          val features = ImageCodec.decodeGray(a.payload)
            .map(ImageCodec.imageFeatures(_, featureDim))
            .orElse(AudioCodec.decodePcm(a.payload)
              .map(AudioCodec.audioFeatures(_, featureDim)))
            .getOrElse(MultimodalStub.decodeToFeatures(a.payload, featureDim))
          AssetFeatures(a.asset_id, a.modality, a.payload.length.toLong,
            MultimodalStub.checksum(a.payload), features)
        }
      }
    }
  }

  // --------------------------------------------- real PNG asset table
  /** Deterministic pixel function shared by the PNG generator and the
    * DuckDB oracle: `pix(x, y) = (x·y + doc_id) mod 256`. Dims
    * `8 + doc_id%9` × `8 + doc_id%7` — every asset a different shape,
    * partial-window edge cases included. */
  def pngDims(docId: Long): (Int, Int) =
    (8 + (docId % 9).toInt, 8 + (docId % 7).toInt)

  def pngPixel(docId: Long)(x: Int, y: Int): Int =
    ((x.toLong * y + docId) % 256).toInt

  /** REAL image assets: the image-modality slice of `documents`
    * (doc_id % 3 = 0, same mapping as [[assetTable]]) with payload =
    * an actual PNG encoded map-side from the deterministic pixel
    * function. Generation, like decode, is per-row CPU inside
    * `mapPartitions` — payloads are born and consumed inside the
    * partition, never shuffled. */
  def pngAssets(s: SparkSession, dir: String): Dataset[Asset] = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id", $"source", $"lang")
      .where($"doc_id" % 3 === 0)
      .as[(Long, String, String)]
      .mapPartitions { it =>
        it.map { case (docId, source, lang) =>
          val (w, h) = pngDims(docId)
          Asset(docId, "image", "png",
            ImageCodec.encodeGrayPng(w, h, pngPixel(docId)),
            Map("source" -> source, "lang" -> lang))
        }
      }
  }

  /** Oracle-checked REAL decode: encode each asset's PNG, decode it
    * back with `ImageIO`, and report integer-exact raster stats. The
    * DuckDB oracle simulates the same pixels arithmetically — any
    * codec dishonesty (wrong dims, color-space drift, sample
    * truncation) breaks the hash. */
  def mImageDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    pngAssets(s, dir)
      .mapPartitions { it =>
        it.map { a =>
          val img = ImageCodec.decodeGray(a.payload).getOrElse(
            sys.error(s"asset ${a.asset_id}: payload is not a decodable image"))
          (a.asset_id, img.width, img.height,
            img.samples.length.toLong, img.sumLum)
        }
      }
      .toDF("asset_id", "width", "height", "n_pixels", "sum_lum")
      .orderBy($"asset_id")
  }

  val mImageDecodeSql: String =
    """WITH img AS (
         SELECT doc_id AS asset_id,
           8 + CAST(doc_id % 9 AS INTEGER) AS width,
           8 + CAST(doc_id % 7 AS INTEGER) AS height,
           doc_id AS d
         FROM documents WHERE doc_id % 3 = 0),
       px AS (
         SELECT asset_id, width, height,
           SUM((x.i * y.j + d) % 256) AS sum_lum
         FROM img,
           UNNEST(generate_series(0, width - 1)) AS x(i),
           UNNEST(generate_series(0, height - 1)) AS y(j)
         GROUP BY 1, 2, 3)
       SELECT asset_id, width, height,
         CAST(width * height AS BIGINT) AS n_pixels,
         CAST(sum_lum AS BIGINT) AS sum_lum
       FROM px ORDER BY asset_id"""

  /** Oracle-checked decode→resize→encode→decode round trip: decode the
    * PNG, nearest-neighbor downsample ×2 ([[ImageCodec.resizeNearest]]:
    * `out(x,y) = in(2x,2y)`, dims `ceil(dim/2)`), re-encode to PNG,
    * decode AGAIN, report stats of the second decode. Exercises writer
    * and reader on every row; the oracle simulates
    * `pix(2x, 2y) = (4xy + doc_id) mod 256` directly. */
  def mImageResizeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    pngAssets(s, dir)
      .mapPartitions { it =>
        it.map { a =>
          val img = ImageCodec.decodeGray(a.payload).getOrElse(
            sys.error(s"asset ${a.asset_id}: payload is not a decodable image"))
          val small = ImageCodec.resizeNearest(img, 2)
          val reencoded = ImageCodec.encodeGrayPng(
            small.width, small.height, small.apply)
          val back = ImageCodec.decodeGray(reencoded).getOrElse(
            sys.error(s"asset ${a.asset_id}: re-encoded PNG failed to decode"))
          (a.asset_id, back.width, back.height, back.sumLum)
        }
      }
      .toDF("asset_id", "width", "height", "sum_lum")
      .orderBy($"asset_id")
  }

  val mImageResizeRoundtripSql: String =
    """WITH img AS (
         SELECT doc_id AS asset_id,
           (8 + CAST(doc_id % 9 AS INTEGER) + 1) // 2 AS width,
           (8 + CAST(doc_id % 7 AS INTEGER) + 1) // 2 AS height,
           doc_id AS d
         FROM documents WHERE doc_id % 3 = 0),
       px AS (
         SELECT asset_id, width, height,
           SUM((4 * x.i * y.j + d) % 256) AS sum_lum
         FROM img,
           UNNEST(generate_series(0, width - 1)) AS x(i),
           UNNEST(generate_series(0, height - 1)) AS y(j)
         GROUP BY 1, 2, 3)
       SELECT asset_id, width, height,
         CAST(sum_lum AS BIGINT) AS sum_lum
       FROM px ORDER BY asset_id"""

  // --------------------------------------------- real WAV asset table
  /** Deterministic PCM sample function shared by the WAV generator and
    * the DuckDB oracle: `s(t) = (t² + 7·doc_id) mod 4096 − 2048` —
    * signed, full 12-bit swing, exactly reproducible in integer SQL.
    * Clip length `64 + doc_id%33` and rate `8000 + (doc_id%5)·1000`
    * vary per asset so no two clips share a shape. */
  def wavSampleRate(docId: Long): Int = 8000 + (docId % 5).toInt * 1000

  def wavNumSamples(docId: Long): Int = 64 + (docId % 33).toInt

  def wavSample(docId: Long)(t: Int): Short =
    ((t.toLong * t + 7 * docId) % 4096 - 2048).toShort

  /** REAL audio assets: the audio-modality slice of `documents`
    * (doc_id % 3 = 1, same mapping as [[assetTable]]) with payload =
    * an actual PCM16 WAV encoded map-side from the deterministic
    * sample function. Generation, like decode, is per-row CPU inside
    * `mapPartitions` — payloads are born and consumed inside the
    * partition, never shuffled. */
  def wavAssets(s: SparkSession, dir: String): Dataset[Asset] = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id", $"source", $"lang")
      .where($"doc_id" % 3 === 1)
      .as[(Long, String, String)]
      .mapPartitions { it =>
        it.map { case (docId, source, lang) =>
          val samples = Array.tabulate(wavNumSamples(docId))(wavSample(docId))
          Asset(docId, "audio", "wav",
            AudioCodec.encodePcm16Wav(wavSampleRate(docId), samples),
            Map("source" -> source, "lang" -> lang))
        }
      }
  }

  /** Oracle-checked REAL audio decode: encode each asset's WAV, decode
    * it back with `javax.sound.sampled`, and report integer-exact PCM
    * stats. The DuckDB oracle simulates the same samples arithmetically
    * — any codec dishonesty (header drift, endianness, truncation)
    * breaks the hash. The audio twin of [[mImageDecode]]. */
  def mAudioDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    wavAssets(s, dir)
      .mapPartitions { it =>
        it.map { a =>
          val clip = AudioCodec.decodePcm(a.payload).getOrElse(
            sys.error(s"asset ${a.asset_id}: payload is not decodable PCM16"))
          (a.asset_id, clip.sampleRate, clip.nSamples.toLong,
            clip.sumPcm, clip.sumAbsPcm)
        }
      }
      .toDF("asset_id", "sample_rate", "n_samples", "sum_pcm", "sum_abs_pcm")
      .orderBy($"asset_id")
  }

  val mAudioDecodeSql: String =
    """WITH aud AS (
         SELECT doc_id AS asset_id,
           8000 + CAST(doc_id % 5 AS INTEGER) * 1000 AS sample_rate,
           64 + CAST(doc_id % 33 AS INTEGER) AS n_samples,
           doc_id AS d
         FROM documents WHERE doc_id % 3 = 1),
       s AS (
         SELECT asset_id, sample_rate, n_samples,
           SUM((t.i * t.i + 7 * d) % 4096 - 2048) AS sum_pcm,
           SUM(ABS((t.i * t.i + 7 * d) % 4096 - 2048)) AS sum_abs_pcm
         FROM aud,
           UNNEST(generate_series(0, n_samples - 1)) AS t(i)
         GROUP BY 1, 2, 3)
       SELECT asset_id, sample_rate, CAST(n_samples AS BIGINT) AS n_samples,
         CAST(sum_pcm AS BIGINT) AS sum_pcm,
         CAST(sum_abs_pcm AS BIGINT) AS sum_abs_pcm
       FROM s ORDER BY asset_id"""

  // ------------------------------------- real multi-frame (GIF) assets
  /** Deterministic frame-pixel function shared by the GIF generator and
    * the DuckDB oracle: `pix(f, x, y) = (x·y + 31·f + doc_id) mod 256`.
    * Dims `8 + doc_id%6` × `8 + doc_id%5`, frame count `3 + doc_id%4` —
    * every asset a different shape, odd and even frame counts both
    * present so the stride-2 sampler hits partial tails. */
  def gifDims(docId: Long): (Int, Int) =
    (8 + (docId % 6).toInt, 8 + (docId % 5).toInt)

  def gifFrameCount(docId: Long): Int = 3 + (docId % 4).toInt

  def gifPixel(docId: Long)(f: Int, x: Int, y: Int): Int =
    ((x.toLong * y + 31L * f + docId) % 256).toInt

  /** REAL video assets: the video-modality slice of `documents`
    * (doc_id % 3 = 2, same mapping as [[assetTable]]) with payload =
    * an actual animated GIF encoded map-side from the deterministic
    * frame-pixel function. Same in-partition birth-to-consumption
    * shape as [[pngAssets]]/[[wavAssets]]. */
  def gifAssets(s: SparkSession, dir: String): Dataset[Asset] = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id", $"source", $"lang")
      .where($"doc_id" % 3 === 2)
      .as[(Long, String, String)]
      .mapPartitions { it =>
        it.map { case (docId, source, lang) =>
          val (w, h) = gifDims(docId)
          Asset(docId, "video", "gif",
            VideoCodec.encodeGrayGif(w, h, gifFrameCount(docId),
              gifPixel(docId)),
            Map("source" -> source, "lang" -> lang))
        }
      }
  }

  /** Oracle-checked REAL frame sampling: decode every SECOND frame of
    * each asset's animated GIF (the keyframe-extractor shape — skipped
    * frames are dropped at decode, inside the partition) and report
    * integer-exact stats of the sampled frames. The DuckDB oracle
    * simulates the same pixels arithmetically. The video twin of
    * [[mImageDecode]]/[[mAudioDecode]]. */
  def mVideoFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    gifAssets(s, dir)
      .mapPartitions { it =>
        it.map { a =>
          val (total, frames) = VideoCodec.decodeFrames(a.payload, stride = 2)
            .getOrElse(sys.error(
              s"asset ${a.asset_id}: payload is not a decodable GIF"))
          (a.asset_id, total.toLong, frames.size.toLong,
            frames.map(_._2.sumLum).sum)
        }
      }
      .toDF("asset_id", "n_frames", "n_sampled", "sum_lum_sampled")
      .orderBy($"asset_id")
  }

  val mVideoFramesSql: String =
    """WITH vid AS (
         SELECT doc_id AS asset_id,
           8 + CAST(doc_id % 6 AS INTEGER) AS width,
           8 + CAST(doc_id % 5 AS INTEGER) AS height,
           3 + CAST(doc_id % 4 AS INTEGER) AS n_frames,
           doc_id AS d
         FROM documents WHERE doc_id % 3 = 2),
       fr AS (
         SELECT asset_id, width, height, n_frames, d, f.f
         FROM vid,
           UNNEST(generate_series(0, n_frames - 1, 2)) AS f(f)),
       px AS (
         SELECT asset_id, n_frames,
           COUNT(DISTINCT fr.f) AS n_sampled,
           SUM((x.i * y.j + 31 * fr.f + d) % 256) AS sum_lum_sampled
         FROM fr,
           UNNEST(generate_series(0, width - 1)) AS x(i),
           UNNEST(generate_series(0, height - 1)) AS y(j)
         GROUP BY 1, 2)
       SELECT asset_id, CAST(n_frames AS BIGINT) AS n_frames,
         CAST(n_sampled AS BIGINT) AS n_sampled,
         CAST(sum_lum_sampled AS BIGINT) AS sum_lum_sampled
       FROM px ORDER BY asset_id"""

  // ------------------------------------------------------ resize (image)
  /** One sampled video frame: payload slice + its index. A real decoder
    * yields pixel buffers; the slicing/batching/flatMap shape is what
    * survives the swap. */
  final case class VideoFrame(asset_id: Long, frame_idx: Long,
      frame_payload: Array[Byte])

  /** Stub "frame" width in bytes — stands in for a decoded frame. */
  val FrameBytes = 256

  /** Frame sampling over video assets: every `stride`-th frame of the
    * payload, map-side 1→N flatMap (payloads never shuffle; the row
    * explosion happens inside the partition, exactly where a keyframe
    * extractor would run). Last frame may be partial. */
  def sampleFrames(assets: Dataset[Asset], stride: Int = 4): Dataset[VideoFrame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.modality == "video").mapPartitions { it =>
      it.flatMap { a =>
        val nFrames = (a.payload.length + FrameBytes - 1) / FrameBytes
        (0 until nFrames by stride).iterator.map { i =>
          val start = i * FrameBytes
          val end = math.min(a.payload.length, start + FrameBytes)
          VideoFrame(a.asset_id, i.toLong,
            java.util.Arrays.copyOfRange(a.payload, start, end))
        }
      }
    }
  }

  /** Resize over image assets: STUB decimation keeps every `factor`-th
    * payload byte (a real implementation decodes pixels and pools;
    * same in-partition 1→1 shape) and tags the metadata. */
  def resizeAssets(assets: Dataset[Asset], factor: Int = 2): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    require(factor >= 1)
    assets.filter(_.modality == "image").mapPartitions { it =>
      it.map { a =>
        val resized = Array.tabulate((a.payload.length + factor - 1) / factor)(
          i => a.payload(i * factor))
        a.copy(payload = resized, meta = a.meta + ("resized" -> s"1/$factor"))
      }
    }
  }

  /** Oracle-checked rollup over the REAL frame-sample operator: per
    * video asset, how many frames were sampled and how many bytes they
    * carry. The stub's arithmetic (256-byte frames, stride 4, partial
    * tail) is mirrored exactly in the DuckDB SQL. */
  def mFrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    sampleFrames(assetTable(s, dir)).toDF()
      .groupBy($"asset_id")
      .agg(count(lit(1)).as("n_frames_sampled"),
        sum(length($"frame_payload")).as("bytes_sampled"))
      .orderBy($"asset_id")
  }

  val mFrameSampleSql: String =
    s"""WITH v AS (
         SELECT doc_id AS asset_id, octet_length(encode(text)) AS len
         FROM documents WHERE doc_id % 3 = 2),
       f AS (
         SELECT asset_id, i, len FROM v,
           UNNEST(generate_series(0, (len + ${FrameBytes - 1}) // $FrameBytes - 1)) AS t(i)
         WHERE i % 4 = 0)
       SELECT asset_id, COUNT(*) AS n_frames_sampled,
         CAST(SUM(LEAST($FrameBytes, len - i * $FrameBytes)) AS BIGINT) AS bytes_sampled
       FROM f GROUP BY asset_id ORDER BY asset_id"""

  /** Oracle-checked rollup over the REAL resize operator: count and
    * total bytes of the decimated image payloads (ceil(len/2) each). */
  def mResizeStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    resizeAssets(assetTable(s, dir)).toDF()
      .agg(count(lit(1)).as("n_assets"),
        sum(length($"payload")).as("resized_bytes"))
  }

  val mResizeStatsSql: String =
    """SELECT COUNT(*) AS n_assets,
       CAST(SUM((octet_length(encode(text)) + 1) // 2) AS BIGINT) AS resized_bytes
       FROM documents WHERE doc_id % 3 = 0"""

  /** Metadata-only rollup — demonstrates that analytic queries over the
    * asset table never deserialize payloads (column pruning drops the
    * binary column at the scan). */
  def modalityStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assetTable(s, dir).toDF()
      .select($"asset_id", $"modality", length($"payload").as("n_bytes"))
      .groupBy($"modality")
      .agg(count(lit(1)).as("n_assets"),
        sum($"n_bytes").as("total_bytes"),
        max($"n_bytes").as("max_bytes"))
      .orderBy($"modality")
  }

  /** Oracle for the metadata rollup (payload length == octet_length of
    * the original text — byte-level equivalence both engines agree on). */
  val modalityStatsSql: String =
    """WITH a AS (
         SELECT doc_id AS asset_id,
           CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           octet_length(encode(text)) AS n_bytes
         FROM documents)
       SELECT modality, COUNT(*) AS n_assets,
         CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
         CAST(MAX(n_bytes) AS BIGINT) AS max_bytes
       FROM a GROUP BY modality ORDER BY modality"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_modality_stats" -> (modalityStats _),
    "m_frame_sample" -> (mFrameSample _),
    "m_resize_stats" -> (mResizeStats _),
    "m_image_decode" -> (mImageDecode _),
    "m_image_resize_roundtrip" -> (mImageResizeRoundtrip _),
    "m_audio_decode" -> (mAudioDecode _),
    "m_video_frames" -> (mVideoFrames _))

  val oracle: Map[String, String] = Map(
    "m_modality_stats" -> modalityStatsSql,
    "m_frame_sample" -> mFrameSampleSql,
    "m_resize_stats" -> mResizeStatsSql,
    "m_image_decode" -> mImageDecodeSql,
    "m_image_resize_roundtrip" -> mImageResizeRoundtripSql,
    "m_audio_decode" -> mAudioDecodeSql,
    "m_video_frames" -> mVideoFramesSql)
}

/** The stubbed codec boundary. Deterministic fakes, clearly marked.
  * Image ([[ImageCodec]]) and audio ([[AudioCodec]]) have graduated to
  * real JDK codecs; this remains the fallback for video (keyframe
  * sampling — no JDK codec exists) and for unrecognized payloads —
  * swap for a real decoder and the signatures stay. */
object MultimodalStub {

  /** STUB for the real decode: derives a fixed-size float vector from
    * payload bytes (mean/var-ish moments over byte windows). Real
    * implementation: decode pixels/samples, pool to featureDim. */
  def decodeToFeatures(payload: Array[Byte], featureDim: Int): Array[Float] = {
    val out = new Array[Float](featureDim)
    if (payload.isEmpty) return out
    val window = math.max(1, payload.length / featureDim)
    var i = 0
    while (i < featureDim) {
      var sum = 0L
      var n = 0
      var j = i * window
      val end = math.min(payload.length, (i + 1) * window)
      while (j < end) { sum += (payload(j) & 0xff); n += 1; j += 1 }
      out(i) = if (n == 0) 0f else sum.toFloat / n / 255f
      i += 1
    }
    out
  }

  /** Deterministic payload checksum (stands in for content-addressing
    * of blobs in an object store). */
  def checksum(payload: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(payload).map("%02x".format(_)).mkString
  }
}
