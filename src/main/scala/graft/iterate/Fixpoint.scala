package graft.iterate

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Driver-loop utilities for iterative (fixpoint) algorithms.
  *
  * The reference's iterative programs either let lineage grow unboundedly
  * (PageRankDataSet/src/main/scala/wc/FollowerCount.scala:63-73 rebinds
  * `ranks` to an ever-deeper plan) or sidestep it by round-tripping state
  * through HDFS between MR jobs (ShortestPathMR/src/main/java/wc/
  * CountFollowers.java:202-207). Here state stays in memory and lineage is
  * cut with `localCheckpoint` on a fixed cadence — the single biggest
  * perf trap of driver-loop algorithms at scale (plan analysis time and
  * task serialization grow superlinearly otherwise).
  */
object Fixpoint {

  /** rows per shuffle partition targeted while sizing the loop's shuffles */
  private val RowsPerPartition = 500000L

  /** partition count proportional to a measured cardinality, capped at the
    * session's configured shuffle width — poor-man's CBO stats for the
    * iterative operators */
  def sizedPartitions(spark: org.apache.spark.sql.SparkSession, rows: Long): Int = {
    val configured = spark.conf.get("spark.sql.shuffle.partitions").toLong
    math.max(1L, math.min(configured, rows / RowsPerPartition + 1)).toInt
  }

  /** Iterate `step` from `init` until `maxIter` or `converged(prev, next)`.
    *
    * Each iteration's state is persisted and materialized (checkpoint
    * eagerly), and the previous state is unpersisted — so executor memory
    * holds at most two state generations regardless of iteration count.
    *
    * @param checkpointEvery cut lineage with localCheckpoint every N
    *   iterations (persist-only in between). 1 = every iteration, which is
    *   right for anything beyond a handful of iterations.
    */
  def iterate(
      init: DataFrame,
      maxIter: Int,
      checkpointEvery: Int = 1,
      converged: (DataFrame, DataFrame) => Boolean = (_, _) => false)(
      step: (DataFrame, Int) => DataFrame): DataFrame = {
    var state = init.persist(StorageLevel.MEMORY_AND_DISK)
    val n = state.count() // materialize so unpersist of inputs is safe

    // Size the loop's shuffle width to the state, not the session default:
    // a fixpoint over a bounded vertex set should not pay hundreds of
    // near-empty tasks per iteration (the dominant cost of small iterative
    // jobs), while a billion-row state keeps the configured width. Restored
    // after the loop.
    val spark = init.sparkSession
    val key = "spark.sql.shuffle.partitions"
    val aqeKey = "spark.sql.adaptive.enabled"
    val configured = spark.conf.get(key)
    val aqeConfigured = spark.conf.get(aqeKey)
    val width = sizedPartitions(spark, n)

    var i = 0
    var done = false
    try {
      spark.conf.set(key, width.toString)
      // AQE's per-stage replanning is pure driver latency once the state is
      // small and plans are stable; keep it for wide states (skew joins).
      if (width <= 4) spark.conf.set(aqeKey, "false")
      while (i < maxIter && !done) {
        var next = step(state, i)
        next =
          if ((i + 1) % checkpointEvery == 0) next.localCheckpoint(eager = true)
          else { val p = next.persist(StorageLevel.MEMORY_AND_DISK); p.count(); p }
        done = converged(state, next)
        state.unpersist(blocking = false)
        state = next
        i += 1
      }
    } finally {
      spark.conf.set(key, configured)
      spark.conf.set(aqeKey, aqeConfigured)
    }
    state
  }

  /** Convergence test used by the reference's SSSP variants
    * (SingleSourceShortestPathRDD/src/main/scala/wc/FollowerCount.scala:42-44):
    * no row changed its value between iterations. `keyCol` must be unique.
    * Implemented as a co-partitioned self-join + count of differing rows.
    */
  def unchanged(keyCol: String, valCol: String)(prev: DataFrame, next: DataFrame): Boolean = {
    val p = prev.select(keyCol, valCol).withColumnRenamed(valCol, "__prev")
    next.select(keyCol, valCol).join(p, keyCol)
      .filter(org.apache.spark.sql.functions.col(valCol) =!= org.apache.spark.sql.functions.col("__prev"))
      .isEmpty
  }
}
