package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (bucketized) interval self-join: pairs of rows with the same key
  * whose timestamps fall within a window, without the quadratic per-key
  * cross product a naive theta-join plans.
  *
  * Any row b with ts_b in (ts_a, ts_a + delta] lives in a's time bucket
  * (floor(ts/delta)) or the next one — so the left side fans out into
  * exactly two bucket keys and the match becomes an equi-join on
  * (key, bucket) plus a residual range filter. Each qualifying pair is
  * produced exactly once (the right row's bucket is unique). At scale the
  * shuffle is 2x rows on (key, bucket) — balanced as long as delta is
  * chosen so a single bucket holds O(1) rows per key; a hot (key, bucket)
  * is the standard AQE skew-join case.
  */
object RangeJoin {

  /** Pairs (id_a, id_b) sharing `key` with 0 < ts_b - ts_a <= delta.
    * Output: (key, id_a, ts_a, id_b, ts_b). `ts` must be an integral
    * column in the same unit as delta. */
  def pairsWithin(df: DataFrame, key: String, id: String, ts: String, delta: Long): DataFrame = {
    require(delta > 0, "delta must be positive")
    val base = df.select(col(key), col(id), col(ts))
    val left = base.select(col(key), col(id).as("id_a"), col(ts).as("ts_a"),
      explode(array(expr(s"$ts div $delta"), expr(s"$ts div $delta") + 1)).as("__bucket"))
    val right = base.select(col(key), col(id).as("id_b"), col(ts).as("ts_b"),
      expr(s"$ts div $delta").as("__bucket"))
    left.join(right, Seq(key, "__bucket"))
      .filter(col("ts_b") > col("ts_a") && col("ts_b") <= col("ts_a") + delta)
      .select(key, "id_a", "ts_a", "id_b", "ts_b")
  }
}
