package graft

import org.apache.spark.sql.functions._
import graft.ops.{Bucketing, Skew}

/** Scale machinery: bucketed co-located joins (no exchange) and salted
  * aggregation equivalence.
  */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join on the bucket key plans no shuffle exchange") {
    val orders = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
    val customer = spark.read.parquet(sf("sf0.001") + "/customer.parquet")
    Bucketing.writeBucketed(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_bucketed", "o_custkey", 8)
    Bucketing.writeBucketed(customer.select("c_custkey", "c_mktsegment"),
      "customer_bucketed", "c_custkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val joined = Bucketing.table(spark, "orders_bucketed")
        .join(Bucketing.table(spark, "customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
      joined.count() // finalize AQE plan
      assert(Bucketing.isShuffleFree(joined), joined.queryExecution.executedPlan.toString)

      // control: the same join on raw parquet must shuffle
      val raw = orders.join(customer, col("o_custkey") === col("c_custkey"))
      raw.count()
      assert(!Bucketing.isShuffleFree(raw))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("partitioned layout prunes directories for partition-key filters") {
    val events = spark.read.parquet(sf("sf0.001") + "/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Bucketing.writePartitioned(events, dir, "event_type")

    val part = spark.read.parquet(dir).filter(col("event_type") === "click")
    part.count()
    val filters = Bucketing.partitionFilters(part)
    assert(filters.contains("event_type"), filters) // pruned at the directory level
    // a non-partition filter must NOT appear as a partition filter
    val noPrune = spark.read.parquet(dir).filter(col("user_id") === 1)
    noPrune.count()
    assert(!Bucketing.partitionFilters(noPrune).contains("user_id"))
    // correctness: partitioned read equals unpartitioned filter
    assert(part.count() == events.filter(col("event_type") === "click").count())
  }

  test("salted collect_list equals unsalted (holistic agg under skew)") {
    // skewed: key 1 holds 80% of rows
    val df = ((1 to 800).map(i => (1L, i.toLong)) ++ (1 to 200).map(i => (2L + i % 5, i.toLong)))
      .toDF("k", "v").repartition(8)
    val salted = Skew.saltedCollectList(df, "k", "v", saltBuckets = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val plain = df.groupBy("k").agg(sort_array(collect_list("v")).as("vals"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(salted == plain)
  }

  test("salted count equals unsalted count") {
    val orders = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
    val salted = Skew.saltedCount(orders, "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = orders.groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join on a skewed key") {
    val left = ((1 to 500).map(_ => 1L) ++ Seq(2L, 3L)).toDF("k").repartition(8)
    val right = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "tag")
    val salted = Skew.saltedJoin(left, right, "k").groupBy("k", "tag").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val plain = left.join(right, "k").groupBy("k", "tag").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(salted == plain)
    assert(salted((1L, "a")) == 500L)
  }
}
