package graft

import graft.model._
import graft.operators.RecallOrchestrator
import org.apache.spark.sql.SparkSession

/** CLI entry mirroring the reference's production query path
  * (`MCPServer.recall_search`, reference `mcp_server.py:13-47`):
  * args = query [mode] [topK] [threshold] [providerOverride].
  * Prints the full contract envelope. */
object RecallCli {
  def main(args: Array[String]): Unit = {
    val query = if (args.nonEmpty) args(0) else "test high confidence query"
    val mode = if (args.length > 1) args(1) else Modes.Conversation
    val topK = if (args.length > 2) args(2).toInt else Defaults.TopK
    val threshold = if (args.length > 3) args(3).toDouble else Defaults.Threshold
    val overrideP = if (args.length > 4) Some(args(4)) else None

    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-recall")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val r = RecallOrchestrator.runRecall(
      spark, query, mode, topK, threshold, overrideP)

    println(s"branch          = ${r.contextPacket.summary.branch}")
    println(s"action          = ${r.nextAction.action}")
    println(s"reason          = ${r.nextAction.reason}")
    println(s"suggestion      = ${r.nextAction.suggestion.getOrElse("-")}")
    println(s"provider        = ${r.contextPacket.provider}")
    println(s"rerank_applied  = ${r.contextPacket.rerank_applied}")
    println(s"top_confidence  = ${r.contextPacket.summary.top_confidence}")
    println(s"candidate_count = ${r.contextPacket.summary.candidate_count}")
    println(s"threshold_met   = ${r.contextPacket.summary.threshold_met}")
    r.contextPacket.candidates.foreach(c =>
      println(f"  candidate ${c.id}%-16s conf=${c.confidence}%.2f src=${c.source} ${c.content}"))
    r.routingMetadata.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(s"  meta $k = $v")
    }
    spark.stop()
  }
}
