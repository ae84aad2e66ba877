package graft

import org.apache.spark.sql.functions._
import graft.ops.QuantileSketch

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("bucket boundary brackets the value at <= 1/16 relative width") {
    // round-trip the key/decode pair at octave edges and deep octaves:
    // boundary(key(v)) <= v < boundary(key(v) + 1), and bucket width is
    // at most lower/16 — the HDR relative-error contract
    val vs = Seq(1L, 2L, 3L, 15L, 16L, 17L, 31L, 32L, 1023L, 1024L,
      999999L, 1L << 40, (1L << 40) + 12345L)
    val rows = QuantileSketch.withBucketKey(vs.toDF("v"), "v")
      .select(col("v"), col("bkt").as("b"))
      .select(col("v"), col("b"),
        expr(QuantileSketch.boundarySpark("b")).as("lo"),
        expr(QuantileSketch.boundarySpark("b + 1")).as("hi"))
      .collect()
    rows.foreach { r =>
      val (v, lo, hi) = (r.getLong(0), r.getDouble(2), r.getDouble(3))
      assert(lo <= v && v < hi, s"v=$v lo=$lo hi=$hi")
      assert(hi - lo <= lo / 16.0 + 1e-9, s"v=$v width=${hi - lo} lo=$lo")
    }
    // zero has its own EXACT bucket (key -1, boundary 0.0) — the sf0.1
    // events table carries genuine zero values
    val z = QuantileSketch.withBucketKey(Seq(0L).toDF("v"), "v")
      .select(col("bkt"), expr(QuantileSketch.boundarySpark("bkt")).as("lo"))
      .collect().head
    assert(z.getLong(0) == -1L && z.getDouble(1) == 0.0)
  }

  test("quantile estimate lands within the per-bucket relative error of the true quantile") {
    // 1..5000 uniformly: true p50=2500, p90=4500, p99=4950; the sketch
    // answer is the containing bucket's lower bound, so est <= true and
    // true < est * (1 + 1/16) within one bucket step
    val d = (1L to 5000L).toDF("v").withColumn("g", lit("all"))
    val sk = QuantileSketch.sketch(d, Seq("g"), "v")
    val q = QuantileSketch.quantiles(sk, Seq("g"), Seq(50, 90, 99)).collect().head
    val est = Map(50 -> q.getDouble(2), 90 -> q.getDouble(3), 99 -> q.getDouble(4))
    val truth = Map(50 -> 2500.0, 90 -> 4500.0, 99 -> 4950.0)
    assert(q.getLong(1) == 5000L)
    truth.foreach { case (p, t) =>
      assert(est(p) <= t && t <= est(p) * (1.0 + 1.0 / 16.0),
        s"p$p est=${est(p)} true=$t")
    }
  }

  test("merged partial sketches == flat sketch, exactly") {
    // three arbitrary partitions of a skewed multiset; sum-merge of the
    // per-partition histograms must reproduce the flat histogram
    // row-for-row (the mergeability contract the catalog oracle proves
    // cross-engine)
    val vals = (1L to 3000L) ++ Seq.fill(500)(7L) ++ Seq.fill(200)(1L << 30)
    val d = vals.zipWithIndex.toDF("v", "i")
      .withColumn("g", lit("all")).withColumn("part", col("i") % 3)
    val flat = QuantileSketch.sketch(d, Seq("g"), "v")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val merged = QuantileSketch.merge(
        QuantileSketch.sketch(d, Seq("g", "part"), "v"), Seq("g"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(merged == flat)
  }
}
