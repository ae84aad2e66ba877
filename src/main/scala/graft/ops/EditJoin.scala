package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity JOIN via deletion-neighborhood blocking
  * (FastSS — Bocek et al., U. Zurich TR 2007): all unordered pairs of
  * rows whose strings are within Levenshtein distance 1, without ever
  * forming the all-pairs relation.
  *
  * Blocking law (k = 1): ed(a, b) ≤ 1 implies a and b share a member of
  * {s} ∪ del1(s) — equal strings share s itself, a substitution pair
  * shares the deletion at the substituted position, an insertion/
  * deletion pair shares the shorter string. So an equi-join on the
  * deletion variants is candidate-COMPLETE, and the exact levenshtein
  * verify restores precision (variant-sharing pairs can be at distance
  * 2 — e.g. a deletion of a and an insertion into b at different spots).
  * EditJoinSpec pins completeness against a brute-force all-pairs DP —
  * the algebraic property a parity oracle alone cannot see.
  *
  * 100 TB design: the candidate relation is banded, never quadratic —
  * each variant v of length m is shared only by strings obtainable from
  * v by inserting at most one character, so a bucket's size is
  * STRUCTURALLY bounded by (m+1)·|Σ| + 1 (alphabet Σ), independent of
  * corpus size: no postings cap, no salting needed — the df bound that
  * LSH band joins get probabilistically, this blocking gets by
  * construction. Candidate generation is O(n·L) rows of width ≤ L.
  * Empty strings are dropped (the empty variant is degenerate — every
  * 1-char string matches it — and Spark's `sequence(1, 0)` would run
  * DESCENDING where DuckDB's `range(1, 1)` is empty, a cross-engine
  * trap documented here so the oracle's WHERE length > 0 stays in step).
  */
object EditJoin {

  /** Deletion variants as a SQL expression: the string itself plus every
    * single-character deletion, deduplicated (adjacent equal characters
    * yield equal variants). */
  def variantsExpr(s: String): String =
    s"array_union(array($s), transform(sequence(1, length($s)), " +
      s"i -> concat(substr($s, 1, i - 1), substr($s, i + 1))))"

  /** The duplicate-safe twin of [[pairsWithin1]]: exact-duplicate
    * strings collapse to one representative (min id) BEFORE the blocked
    * join, and the result carries pair MULTIPLICITIES instead of
    * exploded pairs — one row per unordered group pair (rep1 < rep2,
    * n_pairs = n1·n2) plus one row per duplicated group (rep1 = rep2,
    * dist 0, n_pairs = C(n, 2)). Total Σ n_pairs equals the exploded
    * form's row count exactly (EditJoinSpec pins it), but the OUTPUT is
    * bounded in DISTINCT strings: a corpus where one identity repeats a
    * million times costs one group row here where the exploded form
    * must write ~5·10^11 real pairs — the duplicate-identity regime the
    * sweep prices at 4.6x, closed the way corenessAgg closed the hub
    * (restate the result, don't cap it). */
  def pairsWithin1Grouped(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val g = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(length(col("s")) > 0)
      .groupBy("s").agg(min("id").as("rep"), count(lit(1)).as("n"))
      // (AQE coalesces this tiny agg output to one partition; the
      // fan-out defense lives in pairsWithin1, which re-spreads by id)
      .localCheckpoint(eager = true) // one pass feeds blocking + sizes
    val intra = g.filter(col("n") > 1)
      .select(col("rep").as("rep1"), col("rep").as("rep2"),
        lit(0L).as("dist"), expr("n * (n - 1) div 2").as("n_pairs"))
    val inter = pairsWithin1(g.select(col("rep"), col("s")), "rep", "s")
      .join(g.select(col("rep").as("id1"), col("n").as("n1")), "id1")
      .join(g.select(col("rep").as("id2"), col("n").as("n2")), "id2")
      .select(col("id1").as("rep1"), col("id2").as("rep2"), col("dist"),
        (col("n1") * col("n2")).as("n_pairs"))
    intra.unionByName(inter)
  }

  /** All unordered pairs (id1 < id2) of `df` rows with
    * levenshtein(str1, str2) ≤ 1, with the exact distance. `idCol` must
    * be unique per row; empty strings are dropped (see class doc). */
  def pairsWithin1(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val vars = df
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(length(col("s")) > 0)
      // a small scan (or AQE-coalesced upstream) hands the ×(L+1)
      // fan-out and the join build ONE partition and everything
      // downstream runs single-threaded (measured 73 s vs 8 s at 150k
      // names in the grouped twin — same hazard here: the sf0.1 catalog
      // face dropped 6.2 s → ~2.5 s). Explicit-count repartition is
      // exempt from AQE coalescing; spread by the unique id.
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
        col("id"))
      .select(col("id"), col("s"),
        explode(expr(variantsExpr("s"))).as("v"))
    val a = vars.select(col("id").as("id1"), col("s").as("s1"), col("v"))
    val b = vars.select(col("id").as("id2"), col("s").as("s2"), col("v"))
    a.join(b, Seq("v"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2", "s1", "s2").distinct()
      .filter(expr("levenshtein(s1, s2) <= 1"))
      .select(col("id1"), col("id2"),
        expr("CAST(levenshtein(s1, s2) AS BIGINT)").as("dist"))
  }
}
