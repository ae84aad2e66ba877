package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.iterate.Fixpoint

/** Mass-push PageRank with dangling-mass redistribution via a dummy vertex,
  * matching the reference semantics exactly
  * (PageRankRDD/src/main/scala/wc/FollowerCount.scala:58-70):
  *
  *  - no teleport/damping factor — pure mass push;
  *  - every vertex pushes rank/outDegree along each out-edge (the reference
  *    graph has out-degree 1 everywhere, so it never divides; we divide so
  *    general graphs conserve mass too);
  *  - mass arriving at the dangling dummy vertex is the "delta",
  *    redistributed equally to all real vertices *in the same iteration*,
  *    after which the dummy is zeroed (the RDD variant's semantics — the
  *    DataFrame variant at PageRankDataSet/.../FollowerCount.scala:70 leaks
  *    delta back into the dummy, a reference bug we do not reproduce);
  *  - vertices with no in-links still receive the redistributed delta
  *    (the union-merge at PageRankRDD/.../FollowerCount.scala:64-66).
  *
  * Scale design: the edge relation is repartitioned by src and cached once;
  * each iteration's join then reuses that partitioning (no re-shuffle of the
  * big side). The delta scalar is extracted with a broadcast single-row
  * cross join, not a driver collect, so one iteration = one job. Lineage is
  * cut every iteration via Fixpoint (localCheckpoint).
  */
object PageRank {

  /** @param edges (src LONG, dst LONG) directed edge relation
    * @param dummy  id of the dangling-mass sink vertex (reference: 0)
    * @param realVertexCount number of real (non-dummy) vertices; delta is
    *   divided by this (reference: k*k)
    */
  def run(edges: DataFrame, iterations: Int, dummy: Long, realVertexCount: Long): DataFrame = {
    val spark = edges.sparkSession

    val e = edges.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // initial ranks: every real vertex 1/N, dummy 0 — PageRankRDD/...:49-51
    val init = Graphs.vertices(e)
      .withColumn("rank",
        when(col("vertex") === dummy, lit(0.0))
          .otherwise(lit(1.0 / realVertexCount)))

    val result = Fixpoint.iterate(init, iterations) { (ranks, _) =>
      // push: each edge carries rank(src)/outdeg(src) to dst, summed per dst
      val contrib = e
        .join(outDeg, "src")
        .join(ranks, e("src") === ranks("vertex"))
        .select(col("dst").as("vertex"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("vertex").agg(sum("c").as("c"))

      // dangling delta as a broadcast scalar (no driver round-trip)
      val delta = contrib.filter(col("vertex") === dummy)
        .agg(coalesce(sum("c"), lit(0.0)).as("delta"))

      // union-merge keeps vertices with no in-links (rank would otherwise drop)
      ranks.select(col("vertex"), lit(0.0).as("c"))
        .unionByName(contrib)
        .groupBy("vertex").agg(sum("c").as("rank"))
        .crossJoin(broadcast(delta))
        .select(
          col("vertex"),
          when(col("vertex") === dummy, lit(0.0))
            .otherwise(col("rank") + col("delta") / realVertexCount)
            .as("rank"))
    }
    e.unpersist(false); outDeg.unpersist(false)
    result
  }

  /** Top-k by rank, deterministic tie-break on vertex id
    * (PageRankDataSet/.../FollowerCount.scala:76). Catalyst plans this as
    * TakeOrderedAndProject — no global sort materialization. */
  def topK(ranks: DataFrame, k: Int): DataFrame =
    ranks.orderBy(desc("rank"), asc("vertex")).limit(k)
}
