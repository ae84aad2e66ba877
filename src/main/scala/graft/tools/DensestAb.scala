package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isolated A/B for the round-12 densest-subgraph barrier fusion: the
  * round-11 loop paid TWO driver actions per peel round (state.count() +
  * deg.count()); the fused loop reads (2m, n) off ONE aggregate of the
  * checkpointed degree relation. This main re-implements the OLD loop
  * verbatim (same semantics, same output) and times both on the catalog
  * graph — isolated-vs-isolated in one session, per the bench protocol.
  * Measurement scaffold only; the engine path is Graphs.densestSubgraph. */
object DensestAb {
  /** the round-11 two-barrier loop (state.count + deg.count per round) */
  def densestTwoBarrier(edges: DataFrame, rounds: Int): DataFrame = {
    var state = graft.graph.Graphs.undirectedSized(edges)
    val degs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val stats = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0
    var live = true
    while (i < rounds && live) {
      val twoM = state.count()
      val deg = state.groupBy(col("src").as("vertex"))
        .agg(count(lit(1)).as("deg"))
        .localCheckpoint(eager = true)
      val n = deg.count()
      degs += deg
      stats += ((twoM, n))
      if (twoM == 0L) live = false
      else {
        val keep = deg.filter(lit(2L) * lit(n) * col("deg") > lit(3L) * lit(twoM))
          .select(col("vertex"))
        state = state
          .join(keep.withColumnRenamed("vertex", "src"), Seq("src"), "left_semi")
          .join(keep.withColumnRenamed("vertex", "dst"), Seq("dst"), "left_semi")
          .localCheckpoint(eager = true)
      }
      i += 1
    }
    var best = 0
    for (j <- 1 until stats.length) {
      val (mB, nB) = stats(best); val (mJ, nJ) = stats(j)
      if (Math.multiplyExact(mJ, nB) > Math.multiplyExact(mB, nJ)) best = j
    }
    degs(best).orderBy("vertex")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val edges = graft.queries.GraphQueries.densestEdges(spark, sfDir)
      .localCheckpoint(eager = true)
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime(); f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once, then min-of-2 each, alternating
    for (r <- 1 to 3) {
      val tOld = time(densestTwoBarrier(edges, graft.graph.Graphs.DefaultDensestRounds))
      val tNew = time(graft.graph.Graphs.densestSubgraph(edges))
      println(f"[densestab] round $r: two-barrier=$tOld%.2fs fused=$tNew%.2fs ratio=${tNew / tOld}%.2fx")
    }
    spark.stop()
  }
}
