package graft

import org.apache.spark.sql.functions._
import graft.functions.WelfordAgg

class WelfordSpec extends SparkSpec {
  import spark.implicits._

  test("single-pass Welford matches exact moments on the corpus") {
    val qty = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
      .select(col("l_quantity")).as[Double].repartition(8)
    val w = qty.select(WelfordAgg.column).collect().head
    val e = qty.agg(count(lit(1)), sum("l_quantity"), sum(col("l_quantity") * col("l_quantity")))
      .collect().head
    val (n, sx, sxx) = (e.getLong(0), e.getDouble(1), e.getDouble(2))
    val exactMean = sx / n
    val exactSse = sxx - sx * sx / n
    assert(w.n == n)
    assert(math.abs(w.mean - exactMean) < 1e-9)
    assert(math.abs(w.sse - exactSse) / exactSse < 1e-9)
  }

  test("welford per group via typed groupByKey") {
    val ds = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)).toDS()
    val out = ds.groupByKey(_._1).mapValues(_._2).agg(WelfordAgg.column)
      .collect().map { case (k, s) => k -> s }.toMap
    assert(out("a").n == 2 && out("a").mean == 2.0 && out("a").m2 == 2.0)
    assert(out("b").n == 1 && out("b").mean == 10.0 && out("b").m2 == 0.0)
  }
}
