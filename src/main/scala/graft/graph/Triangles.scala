package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Directed-triangle (3-cycle) counting, the reference's two join
  * strategies re-expressed declaratively:
  *
  *  - ReduceSideJoin (repartition/shuffle join): two chained MR jobs that
  *    tag both edge directions, cross-product per key, then join candidate
  *    closing edges against reversed edges —
  *    ReduceSideJoin/src/main/java/wc/CountFollowers.java:26-164. Here that
  *    is literally `e1 ⋈ e2 ⋈ e3` and Catalyst plans the shuffle joins.
  *  - RepJoin (replicated/broadcast join): edge set loaded into an
  *    in-memory HashMap in every mapper — RepJoin/src/main/java/wc/
  *    CountFollowers.java:31-107. Here a `broadcast()` hint.
  *
  * Both count each 3-cycle three times (once per rotation) and divide by 3
  * (RepJoin/...:119). The `maxId` bound reproduces the reference "max
  * filter" (ReduceSideJoin/...:37: 80000; RepJoin/...:55: 1000) and is
  * pushed beneath the joins by Catalyst.
  */
object Triangles {

  private def bounded(edges: DataFrame, maxId: Long): DataFrame =
    edges.filter(col("src") <= maxId && col("dst") <= maxId)

  /** 3-cycle count via shuffle self-joins (ReduceSideJoin semantics). */
  def countShuffle(edges: DataFrame, maxId: Long): DataFrame =
    cycleCount(bounded(edges, maxId), identity)

  /** 3-cycle count with the closing-edge sides broadcast (RepJoin semantics).
    * Only valid when the bounded edge set fits in executor memory — the same
    * precondition the reference's DistributedCache imposes. */
  def countBroadcast(edges: DataFrame, maxId: Long): DataFrame =
    cycleCount(bounded(edges, maxId), broadcast)

  private def cycleCount(edges: DataFrame, hint: DataFrame => DataFrame): DataFrame = {
    // materialize the (filtered, deduped) edge set once — the three-way
    // self-join would otherwise re-derive it per join input (the planner
    // does not reuse the scan+distinct subtree across self-join aliases)
    val e = edges.localCheckpoint(eager = true)
    val e1 = e.as("e1")
    val e2 = hint(e.as("e2"))
    val e3 = hint(e.as("e3"))
    e1.join(e2, col("e1.dst") === col("e2.src"))
      .join(e3, col("e2.dst") === col("e3.src") && col("e3.dst") === col("e1.src"))
      .agg((count(lit(1)) / 3).as("triangles"))
  }
}
