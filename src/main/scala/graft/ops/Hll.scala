package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog — the DISTINCT-COUNT member of the mergeable-
  * sketch family (quantile/HDR histogram: ranks, sum-merge; [[CountMin]]:
  * frequencies, sum-merge; [[BloomSketch]]: membership, OR-merge; HLL:
  * cardinality, register-wise MAX-merge — idempotent like Bloom's OR, so
  * the fold is replay-safe under at-least-once delivery).
  *
  * The register algebra is the catalog's proven q_agg_hll formulation
  * (Flajolet et al., AofA 2007), factored here so the merge / cube / IVM /
  * streaming faces share one definition: a 64-bit affine hash (TextHash
  * constants — never engine-native hashing) splits into m=64 register
  * buckets (`h % 64`) and a rank payload (`h div 64`) kept as its
  * power-of-two LOWBIT value (`v & -v`) rather than a log — so 2^-rho
  * stays a RATIONAL term: K/(2·lowbit) with K = 2^25 is an exact integer
  * division (lowbit ≤ 2^24 divides K), the register sum is an exact
  * BIGINT, and the estimate alpha·m²·K/sum is ONE IEEE division. Empty
  * registers contribute K each. No small-range correction — callers use
  * it where n >> 2.5m, the raw-HLL regime.
  *
  * Single-source rule (round-14 ADVICE): every hash/register constant
  * lives HERE as a named value, and the DuckDB oracle SQL for all HLL
  * faces is interpolated from the fragment builders below (the
  * CountMin.sketchRowsSql pattern) — engine and oracles share one
  * definition, so a constant can no longer drift on one side.
  *
  * 100 TB design: ≤ m register rows per group regardless of input;
  * map-side partial max absorbs raw rows before the exchange; cubes roll
  * up from per-partition registers by max, never re-scanning the input.
  */
object Hll {

  /** Register count m (and the bucket modulus). */
  val M = 64

  /** K = 2^25: the rational-rho scaling constant (see class doc). */
  val K = 33554432L

  /** Payload when the whole rank field is zero: 2^24, the largest lowbit
    * the `h div M` field (< HashP/M < 2^24·2) can otherwise produce. */
  val EmptyLow = 16777216L

  /** Affine hash constants (TextHash Spread / the q_agg_hll convention —
    * never engine-native hashing). */
  val HashA = 2654435761L
  val HashB = 12345L
  val HashP = 1000000007L

  /** The estimate numerator alpha·m²·K = 0.709 · 2^37 (m = 64, K = 2^25),
    * as portable SQL — both engines parse the CAST spelling. */
  val AlphaM2KSql = "CAST(0.709 AS DOUBLE) * CAST(137438953472 AS DOUBLE)"

  /** The affine hash as SQL — identical text semantics in Spark and
    * DuckDB (BIGINT %, non-negative keys by the caller's contract). */
  def hashSql(k: String): String = s"($HashA * ($k) + $HashB) % $HashP"

  /** DuckDB fragment: register aggregation select-list over a relation
    * exposing column `h` (DuckDB spells integer division `//`). Caller
    * appends `FROM ... GROUP BY ...`. */
  def regsDuck(grpCols: String): String =
    s"""SELECT $grpCols, h % $M AS bkt,
       |    max(CASE WHEN h // $M = 0 THEN $EmptyLow
       |             ELSE (h // $M) & -(h // $M) END) AS mlow""".stripMargin

  /** DuckDB fragment: the estimate over a `regs` relation (bkt, mlow) —
    * exact BIGINT register sum, one IEEE division at the end. */
  def estDuck(grpCols: String, alias: String): String =
    s"""SELECT $grpCols,
       |  $AlphaM2KSql
       |    / CAST(CAST(sum($K // (2 * mlow)) AS BIGINT)
       |           + ($M - count(*)) * $K AS DOUBLE) AS $alias
       |FROM regs GROUP BY $grpCols""".stripMargin

  /** Register tables: one row per (groupCols, bkt) with the max lowbit
    * payload. `keyExpr` must be a non-negative BIGINT SQL expression. */
  def registers(df: DataFrame, groupCols: Seq[String], keyExpr: String): DataFrame =
    df.selectExpr(groupCols :+ s"${hashSql(keyExpr)} AS h": _*)
      .selectExpr(groupCols ++ Seq(s"h % $M AS bkt",
        s"CASE WHEN h div $M = 0 THEN $EmptyLow " +
          s"ELSE (h div $M) & -(h div $M) END AS low"): _*)
      .groupBy((groupCols :+ "bkt").map(col): _*)
      .agg(max("low").as("mlow"))

  /** Merge register tables carrying extra partition columns down to
    * `groupCols`: register-wise MAX — idempotent (max(a, a) = a), so
    * overlapping partials and replayed batches are absorbed. */
  def merge(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs.groupBy((groupCols :+ "bkt").map(col): _*)
      .agg(max("mlow").as("mlow"))

  /** Cardinality estimates from register tables: `apx_parts` per group
    * (alpha = 0.709 for m = 64; alpha·m²·K = 0.709·2^37). */
  def estimate(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs.groupBy(groupCols.map(col): _*)
      .agg(expr(s"sum($K div (2 * mlow))").as("st"), count(lit(1)).as("nb"))
      .selectExpr(groupCols :+
        (s"$AlphaM2KSql / CAST(st + ($M - nb) * $K AS DOUBLE)" +
          " AS apx_parts"): _*)
}
