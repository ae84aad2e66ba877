package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Edge-list I/O matching the reference's file contract (FIXTURES.md F1):
  * headerless CSV, one `follower,followee` pair per line, parsed
  * positionally — ReduceByKey/src/main/scala/wc/FollowersCount.scala:26-27.
  *
  * Schema-on-read replaces the reference's split-and-index (SURVEY P1): the
  * declared schema reaches the CSV reader, malformed lines drop via
  * DROPMALFORMED instead of throwing in a closure (P9 null/arity guard).
  */
object IO {

  final case class Edge(src: Long, dst: Long)

  val edgeSchema: StructType = StructType(Seq(
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = false)))

  /** S1/S2: CSV edge-list scan with declared schema. */
  def readEdgesCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(edgeSchema)
      .option("mode", "DROPMALFORMED")
      .csv(path)
      .na.drop(Seq("src", "dst"))

  /** typed view (SURVEY §1.4: Dataset[Edge] at API edges) */
  def readEdges(spark: SparkSession, path: String): Dataset[Edge] = {
    import spark.implicits._
    readEdgesCsv(spark, path).as[Edge]
  }

  /** S9-S11: CSV sink, comma-separated like the reference's
    * TextOutputFormat (ReduceSideJoin/...:173). The reference's RDD text
    * sinks emit `(k,v)` Tuple2.toString lines — we write declared-format
    * CSV instead (SURVEY §7.3 exact-output-parity note). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("sep", ",").csv(path)

  /** JSONL (newline-delimited JSON) — the training-data interchange
    * format. Reads with a DECLARED schema: schema inference would scan the
    * whole corpus once before the real read, which is two passes at 100 TB
    * and a silent type lottery besides. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "DROPMALFORMED")
      .json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC source/sink — the other columnar format Spark ships natively;
    * same pushdown/pruning properties as parquet, useful when a downstream
    * consumer is ORC-native (Hive/Trino estates). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Range-clustered parquet write: global range partitioning on
    * `clusterCol` plus an in-partition sort gives every output file a
    * tight, pairwise-disjoint min/max range on that column. Parquet
    * footers record those ranges, so a reader's range predicate skips
    * whole files/row-groups — the data-layout lever for time- or
    * key-range-scanned corpora at 100 TB (the poor man's single-column
    * z-order). `files` sizes the write parallelism AND the file count:
    * range partitioning samples the column to build balanced bounds. */
  def writeRangeClustered(df: DataFrame, path: String, clusterCol: String,
      files: Int): Unit =
    df.repartitionByRange(files, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(path)

  /** Small-file compaction: rewrite a parquet directory into ~`targetRows`
    * rows per file. Streaming sinks, fine-grained partitioning, and
    * per-batch appends all breed thousands of KB-sized files whose open/
    * footer overhead dominates scans at 100 TB — the nightly compaction
    * job is how production tables stay scannable. The rewrite goes through
    * a temp dir then swaps, so a failure mid-write never clobbers the
    * readable table. Round-robin repartition (no shuffle key needed) keeps
    * output files uniformly sized. */
  def compact(spark: SparkSession, path: String, targetRows: Long): Unit = {
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1L, (n + targetRows - 1) / targetRows).toInt
    rewriteSwap(spark, path, df.repartition(files), "__compacting")
  }

  /** Key-based upsert (the MERGE INTO shape) against a parquet table:
    * `updates` rows replace same-key current rows; new keys append. The
    * anti-join ships only update keys; the rewrite swaps atomically like
    * compact (a real lakehouse writes a delta log instead of rewriting —
    * the operator keeps the semantics and the atomicity contract). */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
      key: String): Unit = {
    val merged = spark.read.parquet(path)
      .join(updates.select(key), Seq(key), "left_anti")
      .unionByName(updates)
    rewriteSwap(spark, path, merged, "__upserting")
  }

  /** Write `df` to a temp sibling dir, then atomically replace `path` —
    * a failed write never clobbers the readable table. The df must be
    * fully materialized by the write BEFORE the delete (it reads `path`). */
  private def rewriteSwap(spark: SparkSession, path: String, df: DataFrame,
      suffix: String): Unit = {
    val tmp = path.stripSuffix("/") + suffix
    df.write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
  }

  /** Byte-format parity with the reference's RDD text sinks, which emit
    * `Tuple2.toString` lines like `(42,7)`
    * (ReduceByKey/src/main/scala/wc/FollowersCount.scala:29). Use only
    * when diffing raw output dirs against the original jobs — declared
    * CSV (`writeCsv`) is the format a downstream reader should get. */
  def writeTupleText(df: DataFrame, path: String): Unit = {
    val cols = df.columns.map(c => col(c).cast("string"))
    df.select(concat(lit("("), concat_ws(",", cols: _*), lit(")")).as("value"))
      .write.mode("overwrite").text(path)
  }

  /** The reference's lineage dump (`println(counts.toDebugString)` —
    * ReduceByKey/...:30) as its Catalyst equivalent: the formatted
    * physical plan. One call on any DataFrame, printable by app mains. */
  def debugString(df: DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
}
