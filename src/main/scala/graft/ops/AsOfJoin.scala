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

    val leftTagged = payload.foldLeft(left.withColumn("__tag", lit(1))) { (df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val rightTagged = leftExtra.foldLeft(right.withColumn("__tag", lit(0))) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = leftTagged.unionByName(rightTagged)

    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__tag") === 1).drop("__tag")
  }
}
