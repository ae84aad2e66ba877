package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic mergeable Bloom filter — the MEMBERSHIP member of the
  * mergeable-sketch family (HLL: distinct counts, max-merge; quantile/HDR
  * histogram: ranks, sum-merge; Count-Min: point frequencies, sum-merge;
  * Bloom: set membership, OR-merge). The filter is represented
  * RELATIONALLY as the set of occupied (group, row, cell) bits, so the
  * bit-OR merge is a plain DISTINCT union — IDEMPOTENT, unlike the CMS
  * sum: re-adding a batch that overlaps the stored filter cannot corrupt
  * it, which is the property that makes Bloom state safe under at-least-
  * once replay (the streaming-ingest regime) where a linear sketch would
  * double-count.
  *
  * Laws the query faces hash-prove cross-engine (Bloom 1970, CACM 13(7)):
  * NO FALSE NEGATIVES — a present key finds all its [[Depth]] cells
  * occupied (its own occurrences set them, and bits are never cleared) —
  * and merge exactness: bits(A ∪ B) = bits(A) ∪ bits(B). False positives
  * exist by design (absent keys whose cells all collide); they are
  * deterministic here (fixed hashes, fixed data) so the oracle replays
  * them bit-for-bit rather than bounding them.
  *
  * Determinism discipline: the same explicit affine row hashes as
  * [[CountMin]] (single-sourced constants — never engine-native hash
  * functions), widened to [[Width]] = 8192 cells/row so membership stays
  * selective at 10^3–10^4 distinct keys per group (occupancy ~0.2/row →
  * false-positive rate ~(0.2)^4 ≈ 2e-3; at Width 64 the filter would
  * saturate and accept everything — lawful but useless).
  *
  * 100 TB design: the filter relation is ≤ Depth·min(Width, distinct
  * keys) rows per group regardless of input size; map-side partial
  * DISTINCT folds raw rows into bits before the exchange, and per-
  * partition filters roll up cubes by union — membership twin of the
  * HLL register rollup.
  */
object BloomSketch {

  /** Hash rows (= the classic k hash functions). */
  val Depth: Int = CountMin.Depth

  /** Cells per row — sized for selectivity, see class doc. */
  val Width = 8192L

  /** SQL fragment: row `i`'s cell index for BIGINT key expression `k` —
    * [[CountMin]]'s affine maps over the wider cell range, identical text
    * semantics in Spark and DuckDB. */
  def cellExpr(k: String, i: Int): String =
    s"((${CountMin.RowA(i)} * ($k) + ${CountMin.RowB(i)}) % ${CountMin.P}) % $Width"

  private def stackCells(k: String): String =
    (0 until Depth).map(i => s"$i, ${cellExpr(k, i)}")
      .mkString(s"stack($Depth, ", ", ", ") AS (r, c)")

  /** Build the filter: the DISTINCT set of occupied (groupCols, r, c)
    * bits. `keyExpr` must be a non-negative BIGINT SQL expression. */
  def sketch(df: DataFrame, groupCols: Seq[String], keyExpr: String): DataFrame =
    df.selectExpr(groupCols :+ stackCells(keyExpr): _*).distinct()

  /** Merge filters carrying extra partition columns down to `groupCols`:
    * bit-OR = DISTINCT union of occupied cells. Idempotent — overlapping
    * partials (replayed batches, shared keys) collapse. */
  def merge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.select((groupCols :+ "r" :+ "c").map(col): _*).distinct()

  /** Membership probes: for each probe row (groupCols..., k), `hit` is
    * true iff all Depth addressed cells are occupied ("may contain");
    * false is a DEFINITE absence. Works for absent keys (unlike
    * [[CountMin.estimate]]'s present-key contract) — unmatched cells
    * survive the left join as nulls and fail the count. Duplicate probe
    * rows for the same (groupCols, k) are safe: the predicate compares
    * occupied-cell rows against TOTAL rows per group, so a probe stacked
    * n times needs n·Depth occupied matches, not exactly Depth (round-14
    * ADVICE — the old `count(occ) === Depth` would report a genuinely
    * present key as absent if a caller ever passed a duplicated probe). */
  def contains(cells: DataFrame, groupCols: Seq[String],
      probes: DataFrame): DataFrame =
    probes.selectExpr(groupCols ++ Seq("k", stackCells("k")): _*)
      .join(cells.withColumn("occ", lit(1)),
        groupCols ++ Seq("r", "c"), "left")
      .groupBy((groupCols :+ "k").map(col): _*)
      .agg((count("occ") === count(lit(1))).as("hit"))
}
