package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star mandate, SURVEY §2.D): treat
  * image/audio/video payloads as opaque `BinaryType` columns with typed
  * metadata, and run decode / feature-extract / resize / frame-sample as
  * partition-batched functions.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * container — see `MultimodalStub`): a deterministic fake derives
  * "pixels" from payload bytes, so the Spark-side plumbing — schema,
  * batching, partitioning, output shape — is real and tested while the
  * codec call is one function swap away.
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

  /** Decode + feature-extract over partition-local batches. The real
    * pipeline would replace [[MultimodalStub.decodeToFeatures]] with a
    * codec call (JNI/Arrow/external service); everything around it —
    * batching, schema, partition shape — is production code. */
  def extractFeatures(assets: Dataset[Asset], featureDim: Int = 8): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // batch boundary = what a vectorized decoder would receive
        batch.iterator.map { a =>
          AssetFeatures(a.asset_id, a.modality, a.payload.length.toLong,
            MultimodalStub.checksum(a.payload),
            MultimodalStub.decodeToFeatures(a.payload, featureDim))
        }
      }
    }
  }

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
    "m_modality_stats" -> (modalityStats _))

  val oracle: Map[String, String] = Map(
    "m_modality_stats" -> modalityStatsSql)
}

/** The stubbed codec boundary. Deterministic fakes, clearly marked:
  * swap these for real decoders (image: JPEG/PNG via ImageIO or OpenCV
  * JNI; audio: PCM frames; video: keyframe sampling) — signatures stay. */
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
