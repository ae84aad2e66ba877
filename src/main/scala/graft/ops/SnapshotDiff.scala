package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Diff two keyed snapshots into a CDC change set — the inverse of
  * [[CdcApply]]: keys only in `next` become 'I' rows, keys in both whose
  * payload differs become 'U' rows (new payload), keys only in `prev`
  * become 'D' tombstones (old payload); unchanged keys emit nothing.
  *
  * This is the "generate the binlog you never had" operator: given
  * yesterday's and today's table copies, it produces the minimal change
  * set to replicate/downstream — and applying it back to `prev` with
  * CdcApply reproduces `next` exactly (the round-trip law,
  * spec-enforced on randomized snapshots).
  *
  * Scale shape: ONE full-outer join keyed on the primary key — each side
  * shuffles once on the key, or zero times when both snapshots are
  * bucketed on it (Bucketing.writeBucketed); payload comparison is a
  * null-safe column expression, no row-level UDF. Output is sized by the
  * churn, not the table.
  */
object SnapshotDiff {

  /** @param prev old snapshot (one row per key)
    * @param next new snapshot, same schema
    * @param key  primary-key column name
    * @return (key, op I|U|D, payload...) — payload columns keep `prev`'s
    *         names; D rows carry the old payload, I/U rows the new */
  def apply(prev: DataFrame, next: DataFrame, key: String): DataFrame = {
    val payload = prev.columns.filterNot(_ == key).toIndexedSeq
    // 'op' is this operator's one reserved OUTPUT name; internal working
    // columns use a __sd_ prefix no sane payload carries. Reject rather
    // than silently overwrite (withColumn would clobber a payload 'op').
    require(key != "op" && !payload.contains("op"),
      "SnapshotDiff: column name 'op' is reserved for the change-type output")
    require(!(payload :+ key).exists(_.startsWith("__sd_")),
      "SnapshotDiff: column prefix '__sd_' is reserved for internal use")
    def side(df: DataFrame, tag: String) =
      df.select(col(key) +:
        (payload.map(c => col(c).as(s"__sd_${tag}_$c")) :+
          lit(1).as(s"__sd_${tag}_present")): _*)
    val j = side(prev, "p").join(side(next, "n"), Seq(key), "full_outer")
    val changed: Column = payload
      .map(c => !(col(s"__sd_p_$c") <=> col(s"__sd_n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val op = when(col("__sd_p_present").isNull, "I")
      .when(col("__sd_n_present").isNull, "D")
      .when(changed, "U")
    j.withColumn("op", op)
      .filter(col("op").isNotNull) // unchanged keys drop out
      .select(col(key) +: col("op") +: payload.map(c =>
        when(col("op") === "D", col(s"__sd_p_$c")).otherwise(col(s"__sd_n_$c")).as(c)): _*)
  }
}
