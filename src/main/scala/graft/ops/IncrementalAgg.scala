package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a keyed aggregate table (the materialized-
  * view delta pattern): fold a new batch's partial aggregates into an
  * already-aggregated base instead of re-scanning history.
  *
  * Works for the distributive aggregates — count and sum merge by summing
  * partials, min/max by re-min/maxing — which covers the metrics tables a
  * warehouse actually maintains nightly. At 100 TB the payoff is the whole
  * point: the raw history never rescans; the only shuffle is keyed on the
  * group key and sized by |base agg| + |delta|, both orders of magnitude
  * smaller than the fact table. (Algebraic aggregates like avg decompose
  * into sum/count here; holistic ones — exact percentiles — genuinely
  * cannot be maintained this way and need a recompute or a sketch.)
  *
  * Contract (oracle-checked by q_agg_ivm): merge(agg(A), agg(B)) equals
  * agg(A ∪ B) — counts/sums because + is associative-commutative,
  * min/max because they are idempotent semilattice ops. The caller
  * produces both inputs with the SAME aggregate spec; column names carry
  * the roles.
  */
object IncrementalAgg {

  /** Merge two same-schema keyed aggregate tables.
    *
    * @param keys   grouping columns present in both inputs
    * @param counts columns holding COUNT partials (merged by sum)
    * @param sums   columns holding SUM partials (merged by sum; use an
    *               exact type — BIGINT or DECIMAL — so the re-sum is
    *               order-independent)
    * @param mins   columns holding MIN partials (merged by min)
    * @param maxs   columns holding MAX partials (merged by max)
    */
  def merge(base: DataFrame, delta: DataFrame, keys: Seq[String],
      counts: Seq[String] = Nil, sums: Seq[String] = Nil,
      mins: Seq[String] = Nil, maxs: Seq[String] = Nil): DataFrame = {
    val aggs = counts.map(c => sum(col(c)).as(c)) ++
      sums.map(c => sum(col(c)).as(c)) ++
      mins.map(c => min(col(c)).as(c)) ++
      maxs.map(c => max(col(c)).as(c))
    require(aggs.nonEmpty, "merge needs at least one aggregate column")
    base.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
