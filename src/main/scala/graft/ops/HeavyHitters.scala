package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Exact heavy-hitter detection with a Count-Min-Sketch prune — the scale
  * pattern for "which keys occur at least T times" over a key space too
  * large to aggregate cheaply.
  *
  * Pass 1 folds the whole input into a fixed-size CMS (one distributed
  * aggregation, memory bounded regardless of key cardinality). Pass 2
  * re-scans, keeps only rows whose key's CMS estimate reaches the
  * threshold, and exactly counts the survivors. CMS never underestimates,
  * so no true heavy hitter is lost; overestimates only let some light keys
  * through to be discarded by the exact count. The result is exactly
  * `GROUP BY key HAVING count >= T`.
  *
  * Cost model at 100 TB: the exact-count shuffle carries only rows of
  * candidate keys — for a zipfian corpus where heavy keys are a sliver of
  * the key space, that is orders of magnitude fewer shuffled rows than the
  * full aggregation. The sketch itself is `depth x width` longs, built
  * with map-side merging and shipped to pass 2's executors once via the
  * codegen references array (CountMinEstimateExpr).
  */
object HeavyHitters {

  /** Keys of `key` (LONG) appearing at least `threshold` times, with exact
    * counts. `eps`/`confidence` size the sketch: estimate error is at most
    * eps * totalCount with probability `confidence` — pick eps so that
    * eps * totalCount is small relative to `threshold`, or the prune stops
    * pruning (correctness never depends on it). */
  def heavyHitters(df: DataFrame, key: String, threshold: Long,
      eps: Double = 0.0005, confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    val sketch = df.stat.countMinSketch(col(key), eps, confidence, seed)
    df.filter(GraftFunctions.cmsEstimate(col(key), sketch) >= threshold)
      .groupBy(key).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }
}
