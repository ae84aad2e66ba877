package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the right row with the greatest
  * timestamp <= the left timestamp within the same key (inclusive) —
  * the snapshot/checkpoint join a training-data event pipeline needs, and
  * an operator the reference (and Spark's built-ins) lack.
  *
  * Implemented by composition, per the custom-operator preference order:
  * no custom plan needed. Both sides are tagged and unioned, then a single
  * per-key window ordered by (ts, tag) forward-fills the right payload with
  * `last(_, ignoreNulls)`; left rows are then filtered back out. Right rows
  * sort before left rows at equal timestamps, giving inclusive semantics.
  *
  * Scale: one hash shuffle on the key + one window sort — the same cost
  * envelope as a sort-merge join, with no range-explosion (contrast a
  * naive `l JOIN r ON key AND r.ts <= l.ts` + argmax, which is quadratic
  * per key). Skewed keys are ordinary window skew (salt upstream if a key
  * dominates).
  *
  * Requirements: right's payload column names must not collide with left's;
  * right must be unique per (key, ts) — pre-aggregate otherwise (ties at
  * equal ts would be nondeterministic).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val payload = right.columns.filterNot(c => c == keyCol || c == tsCol).toSeq
    val leftExtra = left.columns.filterNot(c => c == keyCol || c == tsCol).toSeq
    require(payload.intersect(leftExtra).isEmpty,
      s"right payload columns collide with left: ${payload.intersect(leftExtra).mkString(",")}")

    // the payload travels as ONE struct (non-null for every right row, null
    // for left rows): last(ignoreNulls) then picks the latest right ROW
    // atomically — a right row whose payload *values* are null still wins,
    // and columns can never mix across right rows
    val payloadStruct = struct(payload.map(col): _*)
    val leftTagged = left.withColumn("__tag", lit(1))
      .withColumn("__asof", lit(null).cast(
        org.apache.spark.sql.types.StructType(payload.map(c => right.schema(c)))))
    val rightTagged = leftExtra.foldLeft(
        right.withColumn("__tag", lit(0)).withColumn("__asof", payloadStruct)
          .drop(payload: _*)) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = leftTagged.unionByName(rightTagged)

    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
    val out = payload.foldLeft(filled.filter(col("__tag") === 1)) { (df, c) =>
      df.withColumn(c, col("__asof")(c))
    }
    out.drop("__tag", "__asof")
  }
}
