package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.IO
import graft.graph.{Graphs, KMeans, PageRank, ShortestPath, Triangles}

private[apps] object Args {
  def require(args: Array[String], n: Int, usage: String): Unit =
    if (args.length < n) { System.err.println(s"Usage: $usage"); sys.exit(1) }
}

/** Drop-in equivalents of the 12 reference programs, one object per
  * program family, same input/output contract (edge-CSV dir in, CSV dir
  * out — the `make local` argument shape, ReduceByKey/Makefile:40). A user
  * of aparnasharma285/MapReduceLearnings switches by calling these instead
  * of spark-submitting the original mains.
  *
  * The reference's four follower-count variants (ReduceByKey, GroupByKey,
  * FoldByKey, AggregateByKey) and the MR one exist to compare manual
  * aggregation strategies; Catalyst always plans partial+final hash
  * aggregation, so they collapse into one operator (SURVEY §4).
  */
object FollowersCountApp {
  /** RBK/GBK/FBK/ABK/CountFollowers semantics: in-degree per followee —
    * ReduceByKey/src/main/scala/wc/FollowersCount.scala:25-29 */
  def run(spark: SparkSession, inDir: String): DataFrame =
    IO.readEdgesCsv(spark, inDir)
      .groupBy(col("dst").as("user"))
      .agg(count(lit(1)).as("followers"))

  def main(args: Array[String]): Unit = {
    Args.require(args, 2, "FollowersCountApp <edge-csv-dir> <out-dir>")
    val spark = graft.core.Sessions.local()
    IO.writeCsv(run(spark, args(0)), args(1))
  }
}

object PageRankApp {
  /** PageRankRDD / PageRankDataSet semantics: synthetic k-chain graph, 10
    * iterations, dummy vertex 0 — PageRankRDD/.../FollowerCount.scala:28-70.
    * Returns all ranks; the RDD variant saves `vertex <= 100`
    * (PageRankRDD/...:73), the DF variant the top-100 by rank
    * (PageRankDataSet/...:76). */
  def run(spark: SparkSession, k: Int, iterations: Int = 10): DataFrame =
    PageRank.run(Graphs.kChain(spark, k), iterations, dummy = 0L,
      realVertexCount = k.toLong * k)

  def first100ByKey(ranks: DataFrame): DataFrame = // RDD-variant output
    ranks.filter(col("vertex") <= 100 && col("vertex") > 0)

  def top100ByRank(ranks: DataFrame): DataFrame = // DF-variant output
    PageRank.topK(ranks, 100)

  def main(args: Array[String]): Unit = {
    Args.require(args, 2, "PageRankApp <k> <out-dir>")
    val spark = graft.core.Sessions.local()
    IO.writeCsv(top100ByRank(run(spark, args(0).toInt)), args(1))
  }
}

object ShortestPathApp {
  /** SingleSourceShortestPath{RDD,DataSet} semantics: unit weights,
    * Infinity sentinel. */
  def run(spark: SparkSession, inDir: String, source: Long): DataFrame =
    ShortestPath.run(IO.readEdgesCsv(spark, inDir), source)

  /** ShortestPathMR adds the actual path payload
    * (ShortestPathMR/.../CountFollowers.java:106-112). */
  def runWithPath(spark: SparkSession, inDir: String, source: Long): DataFrame =
    ShortestPath.runWithPath(IO.readEdgesCsv(spark, inDir), source)
      .withColumn("path", concat_ws(" ", col("path"))) // MR's space-joined path string

  def main(args: Array[String]): Unit = {
    Args.require(args, 3, "ShortestPathApp <edge-csv-dir> <out-dir> <source-vertex>")
    val spark = graft.core.Sessions.local()
    IO.writeCsv(run(spark, args(0), args(2).toLong), args(1))
  }
}

object TriangleCountApp {
  /** ReduceSideJoin (shuffle join, bound 80000) and RepJoin (broadcast
    * join, bound 1000) semantics, `/3` rotation correction. */
  def runShuffle(spark: SparkSession, inDir: String, maxId: Long = 80000): DataFrame =
    Triangles.countShuffle(IO.readEdgesCsv(spark, inDir), maxId)

  def runBroadcast(spark: SparkSession, inDir: String, maxId: Long = 1000): DataFrame =
    Triangles.countBroadcast(IO.readEdgesCsv(spark, inDir), maxId)

  def main(args: Array[String]): Unit = {
    Args.require(args, 2, "TriangleCountApp <edge-csv-dir> <out-dir> [maxId]")
    val spark = graft.core.Sessions.local()
    val maxId = if (args.length > 2) args(2).toLong else 80000L
    IO.writeCsv(runShuffle(spark, args(0), maxId), args(1))
  }
}

object KMeansApp {
  /** K-means over follower counts (the reference clusters the output of
    * its follower-count job, K-means/src/main/java/wc/CountFollowers.java:96-99),
    * k clusters, <=10 iterations, SSE tracked. */
  def run(spark: SparkSession, inDir: String, init: Seq[Double],
      maxIter: Int = 10): KMeans.Result = {
    val counts = FollowersCountApp.run(spark, inDir)
      .select(col("followers").cast("double").as("x"))
    KMeans.run(counts, "x", init, maxIter)
  }

  def main(args: Array[String]): Unit = {
    Args.require(args, 2, "KMeansApp <edge-csv-dir> <out-dir>")
    val spark = graft.core.Sessions.local()
    val res = run(spark, args(0), init = Seq(1.0, 10.0, 100.0, 1000.0))
    import spark.implicits._
    IO.writeCsv(res.centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cluster", "centroid"), args(1))
  }
}


/** Beyond the reference: the training-data curation pipeline as a runnable
  * main — documents parquet in, curated corpus out, partitioned by
  * predicted language with bounded file sizes (Corpus.writeCorpus). The
  * one-command form of q_curate for a library user running ingest. */
object CurateApp {
  def run(spark: SparkSession, docs: DataFrame,
      minWords: Int = 10, minUniqRatio: Double = 0.3,
      threshold: Double = 0.8): DataFrame = {
    import graft.pipeline.{Corpus, Dedup}
    val losers = Dedup.dedupClusters(Dedup.minhashDedup(docs, threshold))
      .filter(col("doc_id") =!= col("keeper")).select("doc_id")
    Corpus.qualityLangGate(docs, minWords, minUniqRatio)
      .join(losers, Seq("doc_id"), "left_anti")
      .join(docs.select("doc_id", "text"), "doc_id")
  }

  def main(args: Array[String]): Unit = {
    Args.require(args, 2, "CurateApp <documents-parquet> <out-dir> [maxRecordsPerFile]")
    val spark = graft.core.Sessions.local()
    val maxRecords = if (args.length > 2) args(2).toLong else 1000000L
    graft.pipeline.Corpus.writeCorpus(
      run(spark, spark.read.parquet(args(0))), args(1),
      partitionCol = "lang_pred", maxRecordsPerFile = maxRecords)
  }
}
