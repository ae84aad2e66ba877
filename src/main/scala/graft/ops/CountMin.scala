package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic mergeable Count-Min sketch — the FREQUENCY member of the
  * mergeable-sketch family (HLL registers merge by MAX, quantile/HDR
  * histograms merge by SUM; CMS cells also merge by SUM, and because the
  * sketch is LINEAR — cells(A ∪ B) = cells(A) + cells(B) cell-for-cell —
  * the merge is not merely estimate-preserving but bit-exact).
  *
  * Shape (Cormode & Muthukrishnan, J. Algorithms 2005): [[Depth]] hash
  * rows × [[Width]] counters per group. Key k lands in cell
  * (i, ((Aᵢ·k + Bᵢ) mod P) mod W) for each row i; a point query reads its
  * Depth cells and returns the MIN. Every collision only ADDS counts, so
  * the estimate never underestimates (est ≥ true count, the law the query
  * faces hash-prove via an in-band boolean), and est ≤ true + 2N/W per
  * row with high probability across independent rows.
  *
  * Determinism discipline (the repo's cross-engine rule): NO engine-native
  * hash functions — the row hashes are explicit affine maps over int64
  * with literal constants (the q_agg_hll convention), so DuckDB replays
  * every cell index bit-for-bit. A·k ≤ 3.3e9 · k stays under 2^63 for any
  * key below ~2.8e9 — fail-fast is the caller's key-domain contract.
  *
  * 100 TB design: the sketch relation is ≤ Depth·Width rows per group
  * REGARDLESS of key cardinality or input size — map-side partial
  * aggregation folds raw rows into cells before the exchange, the shuffle
  * carries cells only, and per-partition sketches roll up a cube by plain
  * addition (never re-scanning the input). The frequency twin of rolling
  * distinct-count cubes from HLL registers.
  *
  * Relationship to [[HeavyHitters]]: that operator uses Spark's NATIVE
  * CMS (`df.stat.countMinSketch`) as a pure prune whose estimates never
  * reach the result, so engine-specific hashing is fine there; THIS
  * sketch's cells ARE the result (merged, cubed, incrementally
  * maintained), so every bit must replay cross-engine.
  */
object CountMin {

  /** Independent hash rows: P(all rows collide) shrinks geometrically. */
  val Depth = 4

  /** Counters per row: point-query overestimate is ~N/Width per colliding
    * row at mass N — size Width to the tolerated absolute error. */
  val Width = 64

  /** Shared modulus of the affine row hashes (prime, > any Width·key). */
  val P = 1000000007L

  /** Per-row affine constants (public mixing primes — Knuth 2654435761,
    * xxHash 2246822519/3266489917, FNV-adjacent odd primes). */
  val RowA = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)
  val RowB = Seq(12345L, 54321L, 98765L, 13579L)

  /** SQL fragment: row `i`'s cell index for BIGINT key expression `k` —
    * identical text semantics in Spark and DuckDB (% is mod on BIGINT in
    * both; inputs are non-negative by the key-domain contract). */
  def cellExpr(k: String, i: Int): String =
    s"((${RowA(i)} * ($k) + ${RowB(i)}) % $P) % $Width"

  private def stackCells(k: String): String =
    (0 until Depth).map(i => s"$i, ${cellExpr(k, i)}")
      .mkString(s"stack($Depth, ", ", ", ") AS (r, c)")

  /** Build the sketch: one row per (groupCols, r, c) with the exact count
    * of key occurrences hashing there. `keyExpr` must be a non-negative
    * BIGINT SQL expression over df's columns. Zero-count cells are absent
    * (sparse form); estimates over probes PRESENT in the input never read
    * an absent cell, because their own occurrences populate all their
    * Depth cells. */
  def sketch(df: DataFrame, groupCols: Seq[String], keyExpr: String): DataFrame =
    df.selectExpr(groupCols :+ stackCells(keyExpr): _*)
      .groupBy((groupCols :+ "r" :+ "c").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge sketches carrying extra partition columns down to `groupCols`:
    * cell-wise SUM — THE merge operation, exact by linearity. Never
    * touches the input relation. */
  def merge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy((groupCols :+ "r" :+ "c").map(col): _*)
      .agg(sum("cnt").as("cnt"))

  /** Point-query estimates: for each probe row (groupCols..., k), the min
    * over the Depth addressed cells — column `est`. Probes must be keys
    * present in the sketched input (see [[sketch]] on sparse cells). */
  def estimate(cells: DataFrame, groupCols: Seq[String],
      probes: DataFrame): DataFrame =
    probes.selectExpr(groupCols ++ Seq("k", stackCells("k")): _*)
      .join(cells, groupCols ++ Seq("r", "c"))
      .groupBy((groupCols :+ "k").map(col): _*)
      .agg(min("cnt").as("est"))
}
