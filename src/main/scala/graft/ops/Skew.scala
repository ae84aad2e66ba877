package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities: salting for hot keys. AQE's runtime skew-join
  * split covers sort-merge joins; salting is the complementary static
  * technique for skewed aggregations and broadcast-infeasible hot-key
  * joins. Results are identical to the unsalted operators (SkewSpec), the
  * plans differ: the first shuffle spreads each hot key over `saltBuckets`
  * partitions.
  */
object Skew {

  /** Two-phase salted aggregation. Note: for *algebraic* aggregates
    * (count/sum/min/max) Catalyst's map-side partial aggregation already
    * neutralizes key skew — salting buys nothing. It matters for
    * *holistic* aggregates whose partial state is as big as the data,
    * like collect_list: one hot key would funnel its entire payload
    * through a single reducer. Phase 1 aggregates (key, salt); phase 2
    * merges the per-salt partials.
    *
    * `spark_partition_id` seeds the salt deterministically per input split
    * (no RNG — keeps retries and reruns stable).
    */
  def saltedCollectList(df: DataFrame, keyCol: String, valCol: String,
      saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id(), lit(saltBuckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(collect_list(col(valCol)).as("__part"))
      .groupBy(col(keyCol))
      .agg(sort_array(flatten(collect_list(col("__part")))).as("vals"))

  /** Same shape for counts — semantically identical to a plain
    * groupBy().count() (proven by the salted catalog query hash-matching
    * the plain-SQL oracle); exists to demonstrate the pattern. */
  def saltedCount(df: DataFrame, keyCol: String, saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id(), lit(saltBuckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum("__partial").as("cnt"))

  /** Salted inner equi-join for a skewed left side against a dimension-ish
    * right side that is too big to broadcast: the right side is replicated
    * `saltBuckets` times (explode), the left side picks one salt bucket per
    * row, and the join key becomes (key, salt) — hot keys spread across
    * buckets. Use only when broadcast is infeasible and AQE's skew split
    * does not apply (e.g. bucketed inputs without exchanges).
    */
  def saltedJoin(leftSkewed: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame = {
    val salted = leftSkewed
      .withColumn("__salt", pmod(spark_partition_id(), lit(saltBuckets)))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
