package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Bloom-prefiltered exact anti-join — the scale pattern for "remove these
  * keys from a huge table" when the key set is too large to broadcast.
  *
  * A bloom filter has no false negatives, so rows whose key fails the probe
  * are *definitely* not in `right` and bypass the join entirely; only the
  * ~fpp fraction of maybe-members (plus true members) pay the exact
  * anti-join shuffle. The result is exactly `left ANTI JOIN right` — false
  * positives only route extra rows through the exact check, never change
  * the output — so q_dedup_final_bloom reuses q_dedup_final's oracle SQL
  * unchanged.
  *
  * Cost model at 100 TB: two scans of `left` (both pruned to `key` +
  * consumed columns, pushdown intact) versus shuffling all of `left` on
  * `key`. Scans are cheap and embarrassingly parallel; the shuffle is the
  * bottleneck — with a 1% fpp the anti-join shuffle shrinks ~100x for a
  * mostly-disjoint key set. The filter itself is built with one distributed
  * aggregation over `right` (Spark's public sketch API) and ships once per
  * executor via the codegen references array (BloomMightContainExpr).
  */
object BloomPrune {

  /** Exact `left ANTI JOIN right ON key`, bloom-pruned. `key` must be a
    * LONG column present on both sides.
    *
    * `left` MUST be deterministic across re-evaluation: the definite/maybe
    * split scans it twice (filter !maybe, filter maybe), and the branches
    * only partition the row set if both scans see the same rows. A
    * non-deterministic source (sampling, rand-derived columns, an input
    * mutating between scans) could drop or duplicate rows — persist or
    * checkpoint such an input before calling. Every graft caller passes a
    * deterministic parquet scan. */
  def bloomAntiJoin(left: DataFrame, right: DataFrame, key: String,
      fpp: Double = 0.01): DataFrame = {
    val keys = right.select(key)
    // expectedNumItems from a measured count (driver scalar, one job) —
    // an overestimate only wastes filter bits, never correctness
    val n = math.max(keys.count(), 1L)
    val filter = keys.stat.bloomFilter(key, n, fpp)
    // null keys: the probe is null, but an equi-anti-join KEEPS null-key
    // rows (null never matches) — so they belong on the definite branch
    val maybe = coalesce(GraftFunctions.bloomMightContain(col(key), filter), lit(false))
    left.filter(!maybe)
      .unionByName(left.filter(maybe).join(keys, Seq(key), "left_anti"))
  }
}
