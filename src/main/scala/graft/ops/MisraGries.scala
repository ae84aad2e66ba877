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

  /** Partition-LOCAL MG summaries (r16) — the
    * [[graft.ops.HeavyHitters.heavyHittersMg]] build. The groupBy-based
    * [[summary]] over (partition-id, key) EXCHANGES one row per distinct
    * (pid, key) before any truncation can cap it — measured 551k
    * shuffled records on a 1M-row wide-domain sweep fixture against the
    * ≤ partitions·(k+1) the prune's design claims. This operator runs
    * the classic one-pass Misra–Gries counter algorithm INSIDE each
    * partition (≤ k counters, decrement-all on overflow — O(k) memory,
    * amortized O(1)/row; strictly better than the hash-aggregate
    * partial, which holds every partition-local distinct key), so
    * nothing shuffles at all here and the ≤ k surviving counters per
    * partition are the only rows that ever reach [[merge]]'s exchange.
    *
    * Per-partition law (Misra & Gries 1982): every key with local count
    * > N_p/(k+1) holds a counter, and counter ≤ true ≤ counter +
    * N_p/(k+1) — summed across partitions by the PODS-2012 merge
    * argument, so the downstream retention guarantee is unchanged.
    * Scope note: unlike [[summary]]'s order-free truncation, WHICH keys
    * hold counters under ties depends on arrival order — fine for a
    * PRUNE (any superset of the true heavies yields the same final
    * exact output) but not oracle-replayable, so the sketch-family
    * catalog faces keep [[summary]]; output (k, est) with est > 0. */
  def summaryLocal(df: DataFrame, keyExpr: String, k: Int = K): DataFrame = {
    require(k > 0, "summary size must be positive")
    val keyed = df.selectExpr(s"($keyExpr) AS k")
    require(keyed.schema("k").dataType ==
        org.apache.spark.sql.types.LongType,
      "summaryLocal requires a LONG key (the heavyHitters contract); " +
        "use summary for other key types")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("est",
        org.apache.spark.sql.types.LongType, nullable = false)))
    // InternalRow in, InternalRow out (GraftBridge) — the per-row
    // Row-conversion of a public mapPartitions costs more than the
    // whole counter algorithm at this loop's size; LongMap keeps the
    // counters primitive (no boxing). A null key holds its own counter
    // variable and participates in the decrement like any other.
    val rdd = keyed.queryExecution.toRdd.mapPartitions { it =>
      val m = new scala.collection.mutable.LongMap[Long]()
      var nullCnt = 0L
      while (it.hasNext) {
        val r = it.next()
        if (r.isNullAt(0)) {
          if (nullCnt > 0L) nullCnt += 1L
          else if (m.size < k) nullCnt = 1L
          else { // decrement-all; the arriving key cancels against them
            m.transformValuesInPlace(_ - 1L); m.filterInPlace((_, v) => v > 0L)
          }
        } else {
          val key = r.getLong(0)
          val cur = m.getOrElse(key, 0L) // counters in the map are ≥ 1
          if (cur > 0L) m.update(key, cur + 1L)
          else if (m.size + (if (nullCnt > 0L) 1 else 0) < k) m.update(key, 1L)
          else {
            m.transformValuesInPlace(_ - 1L); m.filterInPlace((_, v) => v > 0L)
            if (nullCnt > 0L) nullCnt -= 1L
          }
        }
      }
      val out = m.iterator.map { case (key, est) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](key, est)): org.apache.spark.sql.catalyst.InternalRow
      }
      if (nullCnt > 0L) out ++ Iterator.single(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](null, nullCnt)): org.apache.spark.sql.catalyst.InternalRow)
      else out
    }
    org.apache.spark.sql.classic.GraftBridge
      .internalCreateDataFrame(df.sparkSession, rdd, schema)
  }
}
