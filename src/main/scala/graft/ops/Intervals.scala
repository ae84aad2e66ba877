package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands interval coalescing: merge overlapping (or touching)
  * per-key intervals into maximal disjoint spans — the classic
  * availability/session/outage-merge primitive (SQL folklore name:
  * "gaps and islands").
  *
  * Sweep formulation, fully windowed: order each key's intervals by
  * (start, end); an interval OPENS a new island exactly when its start
  * lies strictly past the running max of all previous ends; islands are
  * the running sum of those open flags; one aggregation emits each
  * island's span and member count. Two window passes + one aggregation —
  * all three share the same (key, start, end) sort, so Catalyst plans ONE
  * exchange and ONE sort (PlanSpec-style single-sort shape, like
  * sessionize).
  *
  * Tie robustness: rows with identical (start, end) are interchangeable —
  * whichever lands first opens (or joins) the island and the rest follow
  * into the same island, so the island partition and all emitted spans
  * are invariant to physical tie order. Equal-start rows order by end.
  *
  * At 100 TB: hash-partition by key, partition-local sort; no state
  * beyond the window frame, no driver involvement; skewed keys fall to
  * the same AQE/salting toolbox as every other keyed window here.
  *
  * Output: (key, island LONG, t_start, t_end, n_intervals LONG), islands
  * numbered 1.. per key in span order.
  */
object Intervals {
  def coalesce(df: DataFrame, key: String, start: String, end: String): DataFrame = {
    val order = Window.partitionBy(key).orderBy(col(start), col(end))
    val before = order.rowsBetween(Window.unboundedPreceding, -1)
    val upToHere = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("prev_max_end", max(col(end)).over(before))
      .withColumn("opens",
        when(col("prev_max_end").isNull || col(start) > col("prev_max_end"), 1L)
          .otherwise(0L))
      .withColumn("island", sum("opens").over(upToHere))
      .groupBy(col(key), col("island"))
      .agg(min(col(start)).as("t_start"), max(col(end)).as("t_end"),
        count(lit(1)).as("n_intervals"))
  }
}
