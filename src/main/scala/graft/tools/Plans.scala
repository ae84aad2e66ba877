package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted physical plans for plan review. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_filter_range", "q_agg_sum", "q_join_broadcast", "q_join_inner",
      "q_topk", "q_graph_degree", "q_dedup_minhash", "q_sim_topk")
    names.foreach { n =>
      println(s"\n================ $n ================")
      println(graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
