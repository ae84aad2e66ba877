package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic K-minimum-values (KMV / theta) distinct sketch — the
  * SIXTH member of the mergeable-sketch family, and its SET-OPERATION
  * member (HLL: distinct counts, max-merge; quantile/HDR: ranks,
  * sum-merge; [[CountMin]]: frequencies, sum-merge; [[BloomSketch]]:
  * membership, OR-merge; [[MisraGries]]: heavy hitters, counter-join
  * merge; KMV: distinct counts AND cross-set |A∩B| / |A∪B| / Jaccard
  * estimates, MIN-merge). HLL answers "how many distinct" strictly more
  * cheaply (64 register rows vs K hash rows), but registers cannot
  * intersect — the KMV sample CAN, which is the shape a mixture/
  * decontamination pipeline needs when it asks "how much does source A
  * overlap source B" without paying the exact gram-join price.
  *
  * Algebra (Bar-Yossef et al., RANDOM 2002; Beyer et al., SIGMOD 2007;
  * the theta-sketch framing is Dasgupta et al., 2016): hash every key
  * with one fixed affine permutation of Z_P and keep the [[K]] SMALLEST
  * distinct hash values per group. MERGE = distinct-union then re-take
  * the K smallest — a MIN fold, IDEMPOTENT like Bloom's OR and HLL's
  * max (replaying an overlapping batch cannot corrupt the state; the
  * exactly-once discipline bounds duplicate WORK only). The law
  * K-min(A ∪ B) = K-min(K-min(A) ∪ K-min(B)) is exact, so merges and
  * cubes are bit-for-bit the flat sketch — the oracle computes the flat
  * side and hash equality proves the fold.
  *
  * Estimation: with hashes ~uniform on [0, P), the K-th smallest value
  * h₍K₎ estimates K/(n+1)·P, so est = (K−1)·P / h₍K₎ (the unbiased
  * Beyer et al. form) — computed as ONE IEEE division over exact
  * integer terms ((K−1)·P < 2^53), the HLL rational-estimate
  * convention. An UNSATURATED sketch (fewer than K kept) is not an
  * estimate at all: the affine map is a permutation (A mod P ≠ 0, P
  * prime), so kept-count = true distinct count EXACTLY — the in-band
  * law the query faces prove.
  *
  * Set operations ([[overlap]]): for sketches of A and B, θ = min of
  * the two saturation thresholds (a side's K-th smallest, or P when
  * unsaturated — everything kept). Restricted below θ, BOTH kept sets
  * are exact uniform samples of their sets' hash images, so
  *   |A ∪ B| ≈ |{h ∈ kept_A ∪ kept_B : h < θ}| · P/θ
  *   |A ∩ B| ≈ |{h ∈ kept_A ∩ kept_B : h < θ}| · P/θ
  *   Jaccard ≈ the kept-count ratio (both sides of θ=P degenerate to
  *   EXACT distinct-set arithmetic — the unsaturated regime again).
  *
  * Determinism discipline: one explicit affine hash over int64 with
  * constants single-sourced HERE ([[hashSql]] — the CountMin/Hll
  * convention, never engine-native hashing). Key-domain contract
  * (r15 ADVICE, tightened): keys must be < P ≈ 1.0e9+7 — that is what
  * the exactness/permutation guarantees (and the θ-restricted overlap
  * sampling) quantify over. Keys in [P, ~4e9) merely avoid A·k
  * overflowing 2^63 but ALIAS mod P: distinct keys can collide, the
  * unsaturated "kept-count = true distinct count" law silently breaks,
  * and both engines break identically — the oracle cannot catch it.
  * All current callers (gram hashes mod P, TPC-H keys, user ids) are
  * < P by construction.
  *
  * 100 TB design: state is ≤ K hash rows per group regardless of input
  * — the build's distinct is map-side-partial-absorbed, the K-smallest
  * extraction rides the bounded-heap [[graft.plans.TopKPerKey]]
  * physical operator (every upstream partition capped at K rows per
  * group BEFORE the exchange, so a hot key shuffles K rows like a cold
  * one), and cubes/IVM roll up from stored partials without re-scanning
  * the input. Cross-source overlap joins touch ≤ K·|source pairs| rows
  * — never the gram relation.
  */
object KmvSketch {

  /** Kept hashes per group (relative error ~1/√(K−2) ≈ 13% saturated). */
  val K = 64

  /** Affine hash constants (xxHash mixing prime / the CountMin RowA(1)
    * lane; P is the family's shared prime modulus). A mod P ≠ 0, so the
    * map is a PERMUTATION of Z_P — distinct keys keep distinct hashes,
    * which is what makes the unsaturated regime exact. */
  val HashA = 2246822519L
  val HashB = 54321L
  val P: Long = CountMin.P

  /** The hash as SQL — identical text semantics in Spark and DuckDB
    * (BIGINT %, non-negative keys by the caller's contract). */
  def hashSql(k: String): String = s"($HashA * ($k) + $HashB) % $P"

  /** (K−1)·P — the estimator numerator, exact in IEEE double (< 2^53),
    * single-sourced so the oracle SQL interpolates the same literal. */
  val EstNumerator: Long = (K - 1).toLong * P

  /** Build the sketch: the K smallest distinct hash values per group —
    * (groupCols..., h). `keyExpr` must be a non-negative BIGINT SQL
    * expression with keys < ~4e9 (the affine overflow bound). */
  def sketch(df: DataFrame, groupCols: Seq[String], keyExpr: String): DataFrame =
    graft.plans.TopKPerKey(
      df.selectExpr(groupCols :+ s"${hashSql(keyExpr)} AS h": _*).distinct(),
      groupCols, Seq(("h", true)), K)

  /** Merge sketches carrying extra partition columns down to `groupCols`:
    * distinct union, re-take the K smallest. MIN fold — idempotent,
    * replay-safe (see class doc). */
  def merge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    graft.plans.TopKPerKey(
      sketches.select((groupCols :+ "h").map(col): _*).distinct(),
      groupCols, Seq(("h", true)), K)

  /** Distinct-count estimates per group: (groupCols..., n_kept, est).
    * Unsaturated groups report their EXACT distinct count (permutation
    * argument, class doc); saturated ones the (K−1)·P/h₍K₎ estimator —
    * one IEEE division, the family convention. */
  def estimate(sk: DataFrame, groupCols: Seq[String]): DataFrame =
    sk.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max("h").as("hk"))
      .select(groupCols.map(col) :+ col("n_kept") :+
        when(col("n_kept") < K, col("n_kept").cast("double"))
          .otherwise(lit(EstNumerator.toDouble) / col("hk")).as("est"): _*)

  /** Set-operation estimates between two sketch relations aligned on
    * `groupCols` (one sketch per group on each side): per group,
    * (n_union_kept, n_inter_kept, union_est, inter_est, jaccard_est).
    * θ-restriction per class doc; groups where θ = P (both sides
    * unsaturated) report EXACT distinct-hash-set arithmetic. Inputs are
    * ≤ K rows per group per side, so every stage here is sketch-sized —
    * the exact twin's gram join never runs. */
  def overlap(skA: DataFrame, skB: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    def theta(sk: DataFrame, alias: String) =
      sk.groupBy(g: _*).agg(count(lit(1)).as("n"), max("h").as("mx"))
        .select(g :+ when(col("n") === K, col("mx")).otherwise(lit(P))
          .as(alias): _*)
    val th = theta(skA, "ta").join(theta(skB, "tb"), groupCols)
      .select(g :+ least(col("ta"), col("tb")).as("theta"): _*)
    val kept = skA.select((groupCols :+ "h").map(col): _*).withColumn("ina", lit(1L))
      .join(skB.select((groupCols :+ "h").map(col): _*).withColumn("inb", lit(1L)),
        groupCols :+ "h", "full_outer")
      .join(th, groupCols)
      .filter(col("h") < col("theta"))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_union_kept"),
        sum(when(col("ina") === 1L && col("inb") === 1L, 1L).otherwise(0L))
          .as("n_inter_kept"))
    // θ rows with zero below-θ hashes only arise from empty sketches;
    // the left join + coalesce keeps those groups visible with zeros
    th.join(kept, groupCols, "left")
      .select(g ++ Seq(
        coalesce(col("n_union_kept"), lit(0L)).as("n_union_kept"),
        coalesce(col("n_inter_kept"), lit(0L)).as("n_inter_kept"),
        when(col("theta") === P,
            coalesce(col("n_union_kept"), lit(0L)).cast("double"))
          .otherwise(coalesce(col("n_union_kept"), lit(0L)).cast("double")
            * P / col("theta")).as("union_est"),
        when(col("theta") === P,
            coalesce(col("n_inter_kept"), lit(0L)).cast("double"))
          .otherwise(coalesce(col("n_inter_kept"), lit(0L)).cast("double")
            * P / col("theta")).as("inter_est"),
        when(coalesce(col("n_union_kept"), lit(0L)) > 0L,
            coalesce(col("n_inter_kept"), lit(0L)).cast("double")
              / col("n_union_kept"))
          .otherwise(lit(0.0)).as("jaccard_est")): _*)
  }
}
