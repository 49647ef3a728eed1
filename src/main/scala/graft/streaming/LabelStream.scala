package graft.streaming

import graft.operators.Components
import graft.sources.LakeLayout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Streaming maintenance of a near-dup component LABEL TABLE — the
  * round-trip an always-ingesting corpus pipeline actually runs: each
  * micro-batch of newly detected near-dup pairs folds into the
  * persisted labels with [[Components.incrementalComponents]] (only the
  * touched components re-sweep; cost ∝ batch, never corpus or history)
  * and the updated table is published as the next manifest-committed
  * version via [[LakeLayout.commitLakeVersion]] (atomic pointer rename
  * — readers always see a complete table, crash on either side of the
  * commit leaves the previous version fully readable).
  *
  * Exactly-once across restarts mirrors
  * [[EventsStream.runUpsertToLake]]: a replayed batch from the SAME
  * checkpoint whose (checkpoint, batchId) already heads the commit log
  * is skipped; a replay from a fresh checkpoint re-merges, which
  * converges because folding already-known pairs into a label table is
  * a fixpoint (the touched components re-sweep to the labels they
  * already have). */
object LabelStream {

  /** Schema of the maintained table and of the pair stream. */
  val labelSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("component", LongType, nullable = false)))
  val pairSchema: StructType = StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false)))

  /** Streaming source over a watched directory of (i, j) pair parquet
    * files — one micro-batch per arriving file, the shape a near-dup
    * detector emitting per-ingest pair files produces. */
  def pairSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(pairSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)

  private def emptyLabels(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      labelSchema)

  /** Drive the pair stream into the label table at `lakePath`. Blocks
    * until the finite source drains (the local harness shape; the same
    * query runs unbounded in production). */
  def runIncrementalComponentsToLake(pairs: DataFrame, lakePath: String,
      checkpoint: String): StreamingQuery = {
    val q = pairs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val alreadyCommitted = LakeLayout.latestLakeCommit(s, lakePath)
          .exists(c => c.checkpoint == checkpoint && c.batchId == batchId)
        if (!alreadyCommitted) {
          val labels = LakeLayout.readLake(s, lakePath)
            .getOrElse(emptyLabels(s))
          val merged = Components.incrementalComponents(
            labels, batch.select(col("i"), col("j")))
          // full-table commit by design: a pair batch can relabel whole
          // components anywhere in the key space, so there is no
          // file-local bound on the touched set the way a keyed upsert
          // has — but stats are recorded so downstream keyed readers
          // and future file-granular maintenance can use them
          LakeLayout.commitLakeVersion(
            merged.select(col("doc_id"), col("component")),
            lakePath, checkpoint, batchId, statsKey = Some("doc_id"))
          LakeLayout.vacuumLake(s, lakePath, keep = 2)
        }
      }
      .start()
    q.processAllAvailable()
    q
  }
}
