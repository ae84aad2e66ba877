package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The MapReduce secondary-sort pattern, Spark-native: co-partition rows by
  * a key and order them by (key, ord) WITHIN each partition — no global
  * sort, no driver involvement. This is the contract the reference's MR
  * chains lean on implicitly (values arrive at each reducer grouped by key
  * and sorted by the composite key); in Spark it is `repartition(key)` +
  * `sortWithinPartitions(key, ord)`, and the consumer is a `mapPartitions`
  * that walks contiguous key runs sequentially.
  *
  * Scale: one hash shuffle on the key, then partition-local sorts —
  * exactly the cost of a groupBy, but the consumer streams values in order
  * instead of materializing per-key buffers (the reason MR jobs used
  * secondary sort instead of collecting values in the reducer).
  */
object SecondarySort {

  /** Rows co-partitioned by `key`, partition-locally ordered by
    * (key, ord). Every key's rows are contiguous and ordered in exactly
    * one partition. */
  def sorted(df: DataFrame, key: String, ord: String, partitions: Int): DataFrame =
    df.repartition(partitions, col(key))
      .sortWithinPartitions(col(key), col(ord))

  /** Example consumer of the sorted-run contract: per-key count of
    * strictly-increasing steps in `ord`-ordered `value`s, computed in one
    * sequential pass per partition (no window, no per-key buffer). Rows
    * sharing (key, ord) are tie-broken by `value` so the count is
    * deterministic even when `ord` is not unique. Output:
    * (key, n_rows, n_increasing). */
  def increasingSteps(df: DataFrame, key: String, ord: String,
      value: String, partitions: Int): DataFrame = {
    val s = df.select(col(key).cast("long").as("k"),
        col(ord).cast("long").as("o"), col(value).cast("double").as("v"))
      .repartition(partitions, col("k"))
      .sortWithinPartitions(col("k"), col("o"), col("v"))
    val spark = s.sparkSession
    import spark.implicits._
    s.as[(Long, Long, Double)].mapPartitions { it =>
      new Iterator[(Long, Long, Long)] {
        private val buf = it.buffered
        def hasNext: Boolean = buf.hasNext
        def next(): (Long, Long, Long) = {
          val k = buf.head._1
          var n = 0L; var inc = 0L
          var prev = Double.NaN
          while (buf.hasNext && buf.head._1 == k) {
            val v = buf.next()._3
            if (n > 0 && v > prev) inc += 1
            prev = v; n += 1
          }
          (k, n, inc)
        }
      }
    }.toDF("key", "n_rows", "n_increasing")
  }
}
