package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic mergeable quantile sketch — the quantile member of the
  * mergeable-sketch family (HLL registers merge by max; these bucket
  * histograms merge by SUM), closing the r12 verdict's sketch asymmetry:
  * a 100 TB profiler rolls per-partition sketches up a cube instead of
  * re-ranking raw values.
  *
  * Shape: an HDR-histogram-style fixed-boundary log₂ histogram (same
  * boundary algebra as HdrHistogram, Tene's public design) over
  * NON-NEGATIVE integer values (zero gets its own exact bucket, key -1). Bucket key = octave (index of the highest set bit)
  * × [[SubBuckets]] + linear sub-bucket within the octave, so relative
  * error per bucket is ≤ 1/[[SubBuckets]] across ALL decades of the
  * value range — the property equi-width buckets lose the moment values
  * span scales.
  *
  * Determinism discipline (the repo's log-free rational rule): NO log()
  * anywhere — the octave comes from bit smearing (v|v>>1|…|v>>32, then
  * p = smear - (smear>>1) is the highest power of two ≤ v) and
  * o = bit_count(p-1); the sub-bucket is one exact integer multiply +
  * integral division ((v-p)·S div p). Unlike KLL/t-digest there is no
  * randomized or order-dependent compaction: the sketch of a multiset is
  * a pure FUNCTION of the multiset, merge is bucket-wise integer
  * addition (associative, commutative), and DuckDB replays every step
  * bit-for-bit. Fixed capacity: values < 2^53 occupy ≤ 53·S buckets per
  * group — the 64-ints-per-group HLL contract, whatever the input size.
  *
  * Quantile extraction: target rank r = ceil(q·n) via the integer
  * identity cum ≥ ceil(a/b) ⟺ b·cum ≥ a (no float rank); the estimate is
  * the first qualifying bucket's lower boundary 2^o·(S+sub)/S, computed
  * as (S+sub) << o (exact BIGINT) divided by S — S is a power of two, so
  * even the final DOUBLE division is EXACT, not rounded. */
object QuantileSketch {

  /** Sub-buckets per octave: per-bucket relative error ≤ 1/16 = 6.25%,
    * ~16 extra buckets per octave — the HdrHistogram-default granularity
    * trade. Power of two so the boundary decode is IEEE-exact. */
  val SubBuckets = 16

  /** Attach the HDR bucket key of a positive BIGINT value expression as
    * column `bkt` — pure integer bit arithmetic, staged through named
    * intermediate columns (the smear must fold over the ACCUMULATED
    * value: v|v>>1 covers the top 2 bits, then >>2 doubles the covered
    * run, etc. — shifting the original v instead silently skips bits, a
    * bug the boundary-roundtrip spec pins). Step-for-step identical to
    * the DuckDB replay ([[bucketKeyDuck]]); temp columns are dropped. */
  def withBucketKey(df: DataFrame, valueExpr: String): DataFrame = {
    val staged = Seq(
      "qs_v" -> s"($valueExpr)",
      "qs_s1" -> "qs_v | shiftright(qs_v, 1)",
      "qs_s2" -> "qs_s1 | shiftright(qs_s1, 2)",
      "qs_s3" -> "qs_s2 | shiftright(qs_s2, 4)",
      "qs_s4" -> "qs_s3 | shiftright(qs_s3, 8)",
      "qs_s5" -> "qs_s4 | shiftright(qs_s4, 16)",
      "qs_s6" -> "qs_s5 | shiftright(qs_s5, 32)",
      "qs_p" -> "qs_s6 - shiftright(qs_s6, 1)",
      // zero gets its own exact bucket (key -1, boundary 0.0, zero
      // error) — the CASE also guards the division for v = 0, where
      // p = 0; domain contract: values are NON-negative
      "bkt" -> (s"CASE WHEN qs_v <= 0 THEN CAST(-1 AS BIGINT) ELSE " +
        s"CAST(bit_count(qs_p - 1) AS BIGINT) * $SubBuckets" +
        s" + ((qs_v - qs_p) * $SubBuckets) div qs_p END"))
    staged.foldLeft(df) { case (d, (n, e)) => d.withColumn(n, expr(e)) }
      .drop(staged.map(_._1).filter(_ != "bkt"): _*)
  }

  /** The same key in DuckDB SQL: a SELECT-list fragment using lateral
    * column aliases (each stage references the previous alias — DuckDB
    * resolves them left to right), ending in the `bkt` alias. DuckDB's
    * >> on BIGINT matches Spark's shiftright for the positive values this
    * takes; its bit_count returns TINYINT, which 16·octave overflows —
    * hence the explicit widen. */
  def bucketKeyDuckSelect(v: String): String =
    s"""($v) AS qs_v,
       |    qs_v | (qs_v >> 1) AS qs_s1,
       |    qs_s1 | (qs_s1 >> 2) AS qs_s2,
       |    qs_s2 | (qs_s2 >> 4) AS qs_s3,
       |    qs_s3 | (qs_s3 >> 8) AS qs_s4,
       |    qs_s4 | (qs_s4 >> 16) AS qs_s5,
       |    qs_s5 | (qs_s5 >> 32) AS qs_s6,
       |    qs_s6 - (qs_s6 >> 1) AS qs_p,
       |    CASE WHEN qs_v <= 0 THEN CAST(-1 AS BIGINT) ELSE
       |      CAST(bit_count(qs_p - 1) AS BIGINT) * $SubBuckets
       |        + ((qs_v - qs_p) * $SubBuckets) // qs_p END AS bkt""".stripMargin

  /** Lower boundary of bucket `b` as an exact DOUBLE: (S + sub) << o is
    * an exact BIGINT and S is a power of two, so the division is exact.
    * Spark and DuckDB forms differ only in shift spelling. */
  def boundarySpark(b: String): String =
    s"CASE WHEN ($b) < 0 THEN CAST(0.0 AS DOUBLE) ELSE " +
      s"CAST(shiftleft($SubBuckets + (($b) % $SubBuckets), " +
      s"CAST(($b) div $SubBuckets AS INT)) AS DOUBLE) / $SubBuckets.0 END"
  def boundaryDuck(b: String): String =
    s"CASE WHEN ($b) < 0 THEN CAST(0.0 AS DOUBLE) ELSE " +
      s"CAST((($SubBuckets + (($b) % $SubBuckets)) << (($b) // $SubBuckets)) AS DOUBLE) / $SubBuckets.0 END"

  /** Build the sketch: one histogram row per (groupCols, bkt) with its
    * count — the shuffle carries ≤ 53·S ints per group, never values.
    * Map-side partial aggregation absorbs the raw rows before the
    * exchange (the coreness-histogram discipline). `valueExpr` must be a
    * positive BIGINT SQL expression over df's columns. */
  def sketch(df: DataFrame, groupCols: Seq[String], valueExpr: String): DataFrame =
    withBucketKey(df, valueExpr)
      .groupBy(groupCols.map(col) :+ col("bkt"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge sketches carrying extra partition columns down to `groupCols`:
    * bucket-wise sum — THE merge operation. Never touches the input
    * relation. */
  def merge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col) :+ col("bkt"): _*)
      .agg(sum("cnt").as("cnt"))

  /** Extract quantile estimates from a sketch (columns groupCols ++
    * (bkt, cnt)): per group, n and one DOUBLE column p<pct> per
    * requested integer percent. */
  def quantiles(sk: DataFrame, groupCols: Seq[String],
      pcts: Seq[Int]): DataFrame = {
    val grp = Window.partitionBy(groupCols.map(col): _*)
    val wcum = grp.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sk.withColumn("cum", sum("cnt").over(wcum))
      .withColumn("n", sum("cnt").over(grp))
    // first aggregate the winning bucket per pct (exact integer rank
    // test), then decode boundaries in a second projection — the decode
    // is per-group scalar work on named agg outputs
    val bcols = pcts.map { p =>
      min(when(col("cum") * 100 >= col("n") * p, col("bkt"))).as(s"b$p")
    }
    val agged = cum.groupBy(groupCols.map(col): _*)
      .agg(max("n").as("n"), bcols: _*)
    val qcols = pcts.map(p => expr(boundarySpark(s"b$p")).as(s"p$p"))
    agged.select(groupCols.map(col) ++ (col("n") +: qcols): _*)
  }

  /** Complete flat-sketch oracle SQL over `table`: histogram per
    * (groupCol, bkt) built directly from the full relation + quantile
    * extraction + a total order on the group — the one SQL every engine
    * face (two-level merge, stored+delta IVM, streaming fold) must
    * hash-match, which is exactly the mergeability proof. */
  def flatSql(table: String, groupCol: String, valueSql: String,
      pcts: Seq[Int]): String =
    s"""WITH cents AS MATERIALIZED (
       |  SELECT $groupCol,
       |    ${bucketKeyDuckSelect(valueSql)}
       |  FROM $table),
       |hist AS MATERIALIZED (
       |  SELECT $groupCol, bkt, CAST(count(*) AS BIGINT) AS cnt
       |  FROM cents GROUP BY 1, 2)
       |${quantilesDuck("hist", groupCol, pcts)}
       |ORDER BY $groupCol""".stripMargin

  /** The matching DuckDB extraction over a histogram CTE with columns
    * (groupCol, bkt, cnt) — no trailing ORDER BY so callers append their
    * own total order. */
  def quantilesDuck(histCte: String, groupCol: String, pcts: Seq[Int]): String = {
    val bs = pcts.map(p =>
      s"min(CASE WHEN 100 * cum >= n * $p THEN bkt END) AS b$p").mkString(",\n  ")
    val qs = pcts.map(p => s"${boundaryDuck(s"b$p")} AS p$p").mkString(",\n  ")
    // DuckDB widens window sum(BIGINT) to HUGEINT — n must come back to
    // BIGINT or the driver's type-sensitive hash mismatches (the
    // RelQueries round-1 failure class)
    s"""SELECT $groupCol, n, $qs FROM (
       |  SELECT $groupCol, CAST(max(n) AS BIGINT) AS n,
       |  $bs
       |  FROM (
    |    SELECT $groupCol, bkt, cnt,
       |      sum(cnt) OVER (PARTITION BY $groupCol ORDER BY bkt NULLS FIRST
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |      sum(cnt) OVER (PARTITION BY $groupCol) AS n
       |    FROM $histCte)
       |  GROUP BY $groupCol)""".stripMargin
  }
}
