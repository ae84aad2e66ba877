package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffling a table once at write time so
  * every later equi-join/aggregation on the bucket key is exchange-free.
  * At 100 TB this is the difference between re-shuffling the fact table on
  * every query and shuffling it once at ingest.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** true when the executed plan contains no shuffle exchange — the
    * assertion that a bucketed join actually stayed co-located */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")

  /** Hive-style partitioned parquet layout: one directory per value of
    * `partCol`. At 100 TB this is what makes time/type-sliced queries read
    * a sliver of the data — partition pruning removes whole directories
    * before any I/O (verify with prunedPartitionFilters). */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** the PartitionFilters the scan will prune directories with (empty =
    * full scan). Extracts only the bracket content — the surrounding scan
    * line also names data/pushed filters. */
  def partitionFilters(df: DataFrame): String = {
    val plan = df.queryExecution.executedPlan.toString
    "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(plan)
      .map(_.group(1)).getOrElse("")
  }
}
