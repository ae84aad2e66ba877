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

  /** Zero-job STATS re-bind for an already-materialized relation: a
    * localCheckpoint cuts the RDD lineage but Spark snapshots the
    * originating plan's size estimate onto the new LogicalRDD, so a loop
    * whose step joins the state against derivations of itself compounds
    * the estimate multiplicatively across rounds — doubly-exponential bit
    * growth that overflows Catalyst's BigInteger size product after ~60
    * rounds (observed: Bpe.train at a 64-merge vocabulary; the coloring
    * loop hit the milder planning-latency face of the same hazard).
    * Wrapping the checkpointed RDD in a fresh DataFrame resets the
    * estimate to the scan default while rows keep streaming from the
    * existing checkpoint blocks — no job, no recompute. */
  def rebindStats(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

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
    val seeded = init.persist(StorageLevel.MEMORY_AND_DISK)
    val n = seeded.count() // materialize so unpersist of inputs is safe

    // Size the loop's shuffle width to the state, not the session default:
    // a fixpoint over a bounded vertex set should not pay hundreds of
    // near-empty tasks per iteration (the dominant cost of small iterative
    // jobs), while a billion-row state keeps the configured width.
    //
    // The width (and the AQE toggle below) is set on a LOOP-PRIVATE session
    // cloned from the caller's: newSession() shares the SparkContext, cache
    // manager, and catalog but owns its SQLConf, so concurrent queries on
    // the caller's session never inherit the loop's sizing. Every step
    // function returns a plan rooted at the loop-bound state, so each
    // iteration plans and executes under the private conf.
    val orig = init.sparkSession
    val width = sizedPartitions(orig, n)
    val loop = orig.newSession()
    loop.conf.set("spark.sql.shuffle.partitions", width.toString)
    // AQE's per-stage replanning is pure driver latency once the state is
    // small and plans are stable; keep it for wide states (skew joins).
    if (width <= 4) loop.conf.set("spark.sql.adaptive.enabled", "false")

    // Re-bind the materialized seed to the loop session. Rows stream out of
    // the cached partitions, and the checkpoint makes the switch permanent,
    // so this is a one-time state-sized copy, not a recompute. Lazy (r16):
    // round 1's materialization computes the copy off the seed cache in the
    // same job, so the entry pays ONE job (the sizing count) instead of two;
    // the seed cache is released once the first round has materialized.
    var state = loop.createDataFrame(seeded.rdd, seeded.schema)
      .localCheckpoint(eager = false)
    var seedHeld = true

    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val stepped = step(state, i)
      if ((i + 1) % checkpointEvery == 0) {
        // Lazy checkpoint, materialized BY the convergence test (r16
        // optimization, guide §2.4 "remove passes outright"): the
        // convergence aggregates (monotoneSumUnchanged, countUnchanged,
        // noneMatch) are full scans, so their one job computes the round
        // AND caches the checkpoint blocks — fusing the former
        // eager-checkpoint job and the convergence job into ONE barrier
        // per round (measured: the per-round job latency floor is the
        // dominant cost of every sf0.1 graph fixpoint). A test that scans
        // nothing (the fixed-round default) or stops early (isEmpty-style
        // probes) leaves partitions unmaterialized; Spark's
        // LocalRDDCheckpointData then fills missing partitions after the
        // probe job, and the isCheckpointed guard below runs the one
        // materialization job the eager form would have run anyway — the
        // fusion never ADDS a job, it only removes one where the test
        // already scans everything.
        val next = stepped.localCheckpoint(eager = false)
        val cpRdd = next.queryExecution.analyzed.collectFirst {
          case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
        }
        done = converged(state, next)
        cpRdd match {
          case Some(r) => if (!r.isCheckpointed) r.count()
          case None => next.count() // defensive: unexpected checkpoint plan shape
        }
        state.unpersist(blocking = false)
        state = next
      } else {
        val p = stepped.persist(StorageLevel.MEMORY_AND_DISK); p.count()
        done = converged(state, p)
        state.unpersist(blocking = false)
        state = p
      }
      // round 1 has materialized (through the lazy seed checkpoint) — the
      // seed cache is no longer the only copy and can go
      if (seedHeld) { seeded.unpersist(blocking = false); seedHeld = false }
      i += 1
    }
    if (seedHeld) seeded.unpersist(blocking = false) // maxIter == 0
    state
  }

  /** Convergence for frontier-flag loops (`changed`/`status` columns):
    * true when NO row satisfies `flag`. A full-scan aggregate rather than
    * `filter(flag).isEmpty` — take(1) short-circuits and leaves the lazy
    * checkpoint partially materialized (costing the fill-in job the
    * fusion exists to remove), while the count scans every row in the
    * SAME job that materializes the round's checkpoint. */
  def noneMatch(flag: org.apache.spark.sql.Column): (DataFrame, DataFrame) => Boolean =
    (_: DataFrame, next: DataFrame) => {
      import org.apache.spark.sql.functions.{count, when, lit}
      next.agg(count(when(flag, lit(1)))).first().getLong(0) == 0L
    }

  /** Convergence test used by the reference's SSSP variants
    * (SingleSourceShortestPathRDD/src/main/scala/wc/FollowerCount.scala:42-44):
    * no row changed its value between iterations. `keyCol` must be unique.
    * Implemented as a co-partitioned self-join + count of differing rows.
    */
  /** Convergence for monotonically non-increasing integer state (min-label
    * propagation): per-row values only ever decrease over a constant key
    * set, so equality of consecutive exact column sums implies no row
    * changed. One single-stage aggregation per round on the cached state —
    * replaces `unchanged`'s diff join (a shuffle join per round).
    * DECIMAL(38,0) keeps the sum exact at any vertex count. */
  def monotoneSumUnchanged(valCol: String): (DataFrame, DataFrame) => Boolean = {
    import org.apache.spark.sql.functions.{col, sum}
    var prev: Option[java.math.BigDecimal] = None
    (_: DataFrame, next: DataFrame) => {
      // empty state sums to NULL — normalize to 0 so an empty fixpoint
      // (e.g. CC over a pairless graph) converges instead of NPEing
      val s = Option(
        next.agg(sum(col(valCol).cast(org.apache.spark.sql.types.DecimalType(38, 0))))
          .first().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
      val same = prev.exists(_.compareTo(s) == 0)
      prev = Some(s)
      same
    }
  }

  /** Convergence for deletion-only processes (k-core peeling): the state
    * only ever loses rows, so equal consecutive counts imply a fixpoint.
    * One count job per round on the already-materialized state. */
  def countUnchanged(): (DataFrame, DataFrame) => Boolean = {
    var prev = -1L
    (_: DataFrame, next: DataFrame) => {
      val n = next.count()
      val same = n == prev
      prev = n
      same
    }
  }

  def unchanged(keyCol: String, valCol: String)(prev: DataFrame, next: DataFrame): Boolean = {
    val p = prev.select(keyCol, valCol).withColumnRenamed(valCol, "__prev")
    next.select(keyCol, valCol).join(p, keyCol)
      .filter(org.apache.spark.sql.functions.col(valCol) =!= org.apache.spark.sql.functions.col("__prev"))
      .isEmpty
  }
}
