package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic mergeable Misra–Gries heavy-hitters summary — the FIFTH
  * member of the mergeable-sketch family, and its TOP-K member (HLL:
  * distinct counts, max-merge; quantile/HDR histogram: ranks, sum-merge;
  * [[CountMin]]: point frequencies, sum-merge; [[BloomSketch]]:
  * membership, OR-merge; MG: heavy hitters, counter-join merge). Unlike
  * the four hashed families it is DETERMINISTIC BY CONSTRUCTION — no hash
  * rows at all, so there is no collision probability to size: ≤ [[K]]
  * (key, est) counters per group, with the two-sided law
  *
  *   true − N/(K+1)  ≤  est  ≤  true        (N = the group's total mass)
  *
  * for every RETAINED key, and every key with true count > N/(K+1) is
  * guaranteed retained (the classic Frequent/MG guarantee — Misra & Gries
  * 1982; Metwally et al.'s SpaceSaving keeps the same bound with an upper-
  * biased estimate instead).
  *
  * Order-free construction (the cross-engine determinism rule): the
  * textbook streaming algorithm's state depends on arrival order, which
  * no SQL oracle can replay — so the summary here is the ORDER-FREE
  * equivalent the mergeable-summaries literature reduces it to (Agarwal,
  * Cormode, Huang, Phillips, Wei, Yi — PODS 2012): exact counts of the
  * batch, minus the (K+1)-th largest count d, keeping the ≤ K keys left
  * positive. Subtracting d removes ≥ (K+1)·d mass (the top K+1 keys lose
  * d each), so Σd across every build and merge is ≤ N/(K+1) — which is
  * exactly the per-key error bound, preserved by ANY merge tree.
  *
  * MERGE = counter-join + offset-subtract: sum ests per key across
  * partials, then apply the same truncation to the combined ≤ B·K rows.
  * Fold-algebra classification: the merge is a SUM fold — NOT idempotent
  * (replaying an overlapping batch double-counts, like quantile/CMS and
  * unlike Bloom's OR / HLL's max), so streaming ingest depends on the
  * exactly-once batch_id discipline (CorpusStreams.mgIngest documents
  * this); the N/(K+1) band, however, survives replay REGARDLESS, because
  * replayed mass enters N too.
  *
  * 100 TB design: the state that travels is ≤ K counters per group —
  * partial summaries merge without ever re-scanning the input, cubes roll
  * up from per-batch summaries, IVM folds a delta batch into stored
  * counters. The build's exact batch count uses map-side partial
  * aggregation, and the (K+1)-th-largest extraction runs on the bounded-
  * heap [[graft.plans.TopKPerKey]] operator (partial pass caps every
  * upstream partition at K+1 rows per group BEFORE the exchange), so no
  * stage sorts or shuffles more than K+1 rows per group per partition —
  * a hot key is absorbed map-side like every other family member.
  */
object MisraGries {

  /** Retained counters per summary (the classic k). Error ≤ N/(K+1). */
  val K = 8

  /** Exact per-key batch counts — the build's one aggregation over raw
    * rows. `keyExpr` must be a SQL expression over df's columns; output
    * (groupCols..., k, cnt). */
  def counts(df: DataFrame, groupCols: Seq[String], keyExpr: String): DataFrame =
    df.selectExpr(groupCols :+ s"($keyExpr) AS k": _*)
      .groupBy((groupCols :+ "k").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** The MG truncation at summary size `k`: keep keys with cnt strictly
    * above the (k+1)-th largest count d (so ≤ k survive even under
    * ties), est = cnt − d. Top-(k+1) extraction rides the bounded-heap
    * TopKPerKey physical operator — never a per-group sort of the full
    * count relation; the d/filter pass is then a window over ≤ k+1 rows
    * per group. */
  private[graft] def truncate(cnts: DataFrame, groupCols: Seq[String],
      k: Int = K): DataFrame = {
    val top = graft.plans.TopKPerKey(cnts, groupCols,
      Seq(("cnt", false), ("k", true)), k + 1)
    val w = Window.partitionBy(groupCols.map(col): _*)
    top
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__d",
        when(col("__n") === (k + 1), min("cnt").over(w)).otherwise(lit(0L)))
      .filter(col("cnt") > col("__d"))
      .select((groupCols.map(col) :+ col("k") :+
        (col("cnt") - col("__d")).as("est")): _*)
  }

  /** Build the summary of a batch: ≤ k rows (groupCols..., k, est).
    * `k` defaults to the catalog's fixed [[K]]; callers sizing the
    * summary to a retention threshold (every key with true count >
    * N/(k+1) is retained — [[graft.ops.HeavyHitters.heavyHittersMg]])
    * pass their derived k. */
  def summary(df: DataFrame, groupCols: Seq[String], keyExpr: String,
      k: Int = K): DataFrame =
    truncate(counts(df, groupCols, keyExpr), groupCols, k)

  /** Merge summaries carrying extra partition columns down to `groupCols`:
    * per-key est sum over the ≤ B·k combined rows, then the same
    * truncation. SUM fold — exactly-once-dependent (see class doc). */
  def merge(summaries: DataFrame, groupCols: Seq[String],
      k: Int = K): DataFrame =
    truncate(
      summaries.groupBy((groupCols :+ "k").map(col): _*)
        .agg(sum("est").as("cnt")),
      groupCols, k)
}
