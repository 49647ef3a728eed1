package graft

import graft.operators.RecallOrchestrator
import graft.validation.Scenarios
import org.apache.spark.sql.SparkSession

/** Scenario-replay CLI — the driver-facing twin of the reference's debug
  * endpoint `MCPServer.validate_branch` (reference `mcp_server.py:49-94`):
  * replays the given scenario ids (or the entire catalog with no args)
  * through the Spark orchestrator and prints the same result fields the
  * reference returns — expected vs actual branch/action, rerank_type,
  * provider, and the match booleans. Unknown ids report
  * `success=false error=...` exactly like the reference; any mismatch or
  * unknown id exits non-zero. */
object ValidateCli {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-validate")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ids = if (args.nonEmpty) args.toSeq else Scenarios.all.map(_.id)
    var failures = 0
    ids.foreach { id =>
      Scenarios.byId(id) match {
        case None =>
          failures += 1
          println(s"$id success=false error=Scenario $id not found")
        case Some(s) =>
          // only "validation"-tagged scenarios replay with a forced
          // branch (reference mcp_server.py:73-80)
          val forced = s.tags.contains("validation")
          val r = RecallOrchestrator.runRecall(
            spark, s.request.query, s.request.mode, s.request.topK,
            s.request.threshold, s.request.providerOverride,
            s.flags, s.status,
            validationMode = forced,
            forceBranch = if (forced) Some(s.expectedBranch) else None)
          val branchMatch = r.contextPacket.summary.branch == s.expectedBranch
          val actionMatch = r.nextAction.action == s.expectedAction
          if (!branchMatch || !actionMatch) failures += 1
          println(
            s"$id success=true" +
              s" description=${s.description.replace(' ', '_')}" +
              s" expected_branch=${s.expectedBranch}" +
              s" actual_branch=${r.contextPacket.summary.branch}" +
              s" expected_action=${s.expectedAction}" +
              s" actual_action=${r.nextAction.action}" +
              s" rerank_type=${r.routingMetadata.getOrElse("rerank_type", "-")}" +
              s" provider=${r.routingMetadata.getOrElse("selected_provider", "-")}" +
              s" branch_match=$branchMatch action_match=$actionMatch")
      }
    }
    println(s"validated ${ids.size} scenario(s), $failures failure(s)")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
