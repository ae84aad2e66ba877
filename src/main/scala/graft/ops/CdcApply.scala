package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Apply a CDC change stream to a keyed base snapshot — the Debezium/
  * binlog-compaction pattern: each change row carries the key, a
  * monotonically increasing sequence number, an op ('I'nsert / 'U'psert /
  * 'D'elete tombstone), and the full new payload. The LATEST change per
  * key wins; I and U both materialize the payload, D removes the key;
  * base keys without changes pass through untouched.
  *
  * Scale shape: one keyed window over the change stream (changes are the
  * small side — a day's binlog vs the full table), then one anti-join
  * keyed on the primary key; the base table streams through exactly once
  * and only its key column drives the join. This is the set-based batch
  * formulation of what IO.upsert does for the two-op case; the oracle
  * (q_cdc_apply) checks it against a pure-SQL CASE/anti-join/union
  * reformulation.
  */
object CdcApply {

  /** @param base    keyed snapshot (one row per key)
    * @param changes change rows: key + `seqCol` + `opCol` + the payload
    *                columns of `base` (same names)
    * @param key     primary-key column name
    * @param seqCol  change ordering column (unique per key)
    * @param opCol   'I' | 'U' | 'D'
    */
  def apply(base: DataFrame, changes: DataFrame, key: String,
      seqCol: String, opCol: String): DataFrame = {
    // internal rank column must not shadow (and then drop) user data
    require(!changes.columns.contains("__rn"),
      "CdcApply: column name '__rn' is reserved for internal use")
    val w = Window.partitionBy(key).orderBy(desc(seqCol))
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val survivors = latest.filter(col(opCol) =!= "D")
      .drop(seqCol, opCol)
      .select(base.columns.map(col).toIndexedSeq: _*)
    base.join(latest.select(col(key)), Seq(key), "left_anti")
      .unionByName(survivors)
  }
}
