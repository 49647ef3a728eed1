package graft

import graft.operators.{Components, Dedup, Sampling, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end training-data preparation drive — the COMPOSED form of the
  * operators the driver checks individually (`d_winnow_overlap`,
  * `d_corpus_funnel`, `d_hash_split`):
  *
  *   documents → near-dedup (winnowing overlap, one min-doc_id survivor
  *                           per connected component)
  *             → token-length quality gate → language gate
  *             → deterministic hash split
  *             → parquet partitioned by split
  *
  * then reads the written corpus back, prints the per-split inventory,
  * cross-checks the survivor count against `d_corpus_funnel`'s n_final,
  * and proves split pruning (a train-only read plans a PartitionFilter,
  * so a training job never scans val/test files).
  *
  * args: [sfDir] [outDir]                — batch cleaning drive
  *       stream [sfDir] [outDir]         — streaming sessionize drive:
  * runs [[graft.streaming.EventsStream.sessionizeStream]] through the
  * parquet file sink with a checkpoint (the production deployment
  * shape) and verifies the on-disk output is an exact multiset match
  * of the batch `q_sessionize_events` sessions the final watermark
  * could release.
  *       labels [sfDir]                  — streaming label-table drive:
  * splits the corpus's real MinHash∪SimHash near-dup pair set into
  * three "detector batches", streams them through
  * [[graft.streaming.LabelStream.runIncrementalComponentsToLake]]
  * (incremental CC fold + manifest-committed lake versions), and
  * verifies the final table is an exact multiset match of the one-shot
  * connected-components closure over ALL pairs.
  */
object PipelineCli {
  def main(args: Array[String]): Unit = {
    val streamMode = args.headOption.contains("stream")
    val labelsMode = args.headOption.contains("labels")
    val rest = if (streamMode || labelsMode) args.drop(1) else args
    val sfDir = if (rest.nonEmpty) rest(0) else "/root/testdata/sf0.001"
    val outDir =
      if (rest.length > 1) rest(1)
      else java.nio.file.Files.createTempDirectory(
        if (streamMode) "graft-stream-sessions" else "graft-clean-corpus").toString
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    if (streamMode) {
      val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt")
      val r = graft.streaming.EventsStream.sessionizeParquetDrive(
        spark, sfDir, outDir, ckpt.toString)
      println(s"stream_sessions  = ${r.nStreamed}")
      println(s"batch_releasable = ${r.nReleasable} (match=${r.parity})")
      println(s"withheld_trailing = ${r.nWithheld}")
      println(s"only_stream = ${r.onlyStream}, only_batch = ${r.onlyBatch}")
      println(s"out_dir = $outDir")
      spark.stop()
      if (!r.parity) sys.exit(1)
      return
    }

    if (labelsMode) {
      import graft.streaming.LabelStream
      val root = java.nio.file.Files.createTempDirectory("graft-labels-drive")
      val srcDir = s"$root/pairs"
      java.nio.file.Files.createDirectory(java.nio.file.Paths.get(srcDir))
      val pairs = Dedup.dMinhashLsh(spark, sfDir).select($"i", $"j")
        .union(Dedup.dSimhashPairs(spark, sfDir).select($"i", $"j"))
        .distinct().cache()
      // three detector batches arriving over time (closure is
      // order-independent, the sleeps just pin the replay order)
      for (b <- 0 until 3) {
        pairs.filter(pmod($"i" + $"j", lit(3)) === b).coalesce(1)
          .write.parquet(s"$srcDir/batch_$b")
        Thread.sleep(1100)
      }
      val lake = s"$root/labels"
      val q = LabelStream.runIncrementalComponentsToLake(
        LabelStream.pairSource(spark, s"$srcDir/*"), lake, s"$root/ckpt")
      q.stop()
      val streamed = graft.sources.LakeLayout.readLake(spark, lake).get
      val batch = Components.connectedComponents(pairs.select($"i", $"j"))
      val onlyS = streamed.exceptAll(batch).count()
      val onlyB = batch.exceptAll(streamed).count()
      pairs.unpersist(blocking = false)
      println(s"pair_batches    = 3")
      println(s"streamed_labels = ${streamed.count()}")
      println(s"batch_labels    = ${batch.count()} " +
        s"(match=${onlyS == 0 && onlyB == 0})")
      println(s"only_stream = $onlyS, only_batch = $onlyB")
      val manifests = new java.io.File(s"$lake/_commits").listFiles()
        .map(_.getName).count(_.endsWith(".manifest"))
      println(s"lake_versions_retained = $manifests")
      println(s"lake_dir = $lake")
      spark.stop()
      if (onlyS != 0 || onlyB != 0) sys.exit(1)
      return
    }

    val docs = Tables.load(spark, sfDir, "documents")
    // the overlap self-join is the drive's dominant cost — compute it
    // ONCE and share it with both the cleaning anti-join and the funnel
    // cross-check
    val overlap = Dedup.dWinnowOverlap(spark, sfDir).cache()
    // transitively-consistent survivor policy, same as the funnel: min
    // doc_id per overlap component survives (CC reads the cached pairs)
    val dropped = Components.connectedComponents(overlap.select($"i", $"j"))
      .filter($"doc_id" =!= $"component").select($"doc_id")
    val cleaned = docs
      .join(dropped, Seq("doc_id"), "left_anti")
      .filter(size(TextAnalysis.tokens($"text")) >= Dedup.FunnelMinTokens)
      .filter($"lang" === "en")
      .withColumn("split", Sampling.splitCol($"doc_id"))
    cleaned.write.mode("overwrite").partitionBy("split").parquet(outDir)

    val back = spark.read.parquet(outDir)
    val nBack = back.count()
    val funnel = Dedup.dCorpusFunnel(spark, sfDir, Some(overlap)).collect().head
    overlap.unpersist(blocking = false)
    println(s"input_docs   = ${docs.count()}")
    println(s"cleaned_docs = $nBack")
    println(s"funnel_final = ${funnel.getAs[Long]("n_final")} " +
      s"(match=${funnel.getAs[Long]("n_final") == nBack})")
    back.groupBy($"split").count().orderBy($"split").collect()
      .foreach(r => println(f"  split ${r.getString(0)}%-6s = ${r.getLong(1)}"))
    val trainPlan = back.filter($"split" === "train")
      .queryExecution.executedPlan.toString
    println(s"train_read_partition_pruned = ${
      trainPlan.contains("PartitionFilters: [isnotnull(split") ||
        trainPlan.contains("PartitionFilters: [(split")}")
    // pack the train split into token-budget shards (the last step a
    // training job needs before writing tokenized shards) and prove
    // token conservation against the split's own accounting
    val train = back.filter($"split" === "train")
    val shards = Sampling.packShards(train).collect()
    val shardTokens = shards.map(_.getAs[Long]("shard_tokens")).sum
    // coalesce: sum over an empty split is NULL, not 0
    val trainTokens = train
      .agg(coalesce(sum(size(TextAnalysis.tokens($"text"))).cast("bigint"),
        lit(0L))).head().getLong(0)
    println(s"train_shards = ${shards.length} " +
      s"(writers=${shards.map(_.getAs[Long]("writer")).distinct.length}, " +
      s"budget=${Sampling.ShardTokenBudget})")
    println(s"shard_tokens = $shardTokens (match=${shardTokens == trainTokens})")
    println(s"out_dir = $outDir")
    spark.stop()
  }
}
