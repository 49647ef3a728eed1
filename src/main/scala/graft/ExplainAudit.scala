package graft
import org.apache.spark.sql.SparkSession
/** Plan audit: prints formatted physical plans for representative
  * queries so pushdown/broadcast/codegen regressions are visible.
  * Usage: runMain graft.ExplainAudit [queryName ...] */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q3_shipping_priority", "r4_topk_memory",
        "s_cosine_topk", "q_topk_events_per_user", "d_winnow_overlap",
        "d_hash_split", "s_ivf_topk", "q_cohort_retention", "q_event_funnel",
        "t_vocab_coverage", "d_split_drift_ranged")
    for (n <- names) {
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
