package graft

import org.apache.spark.sql.functions._
import graft.ops.CountMin

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  // brute-force replay of the affine row hashes in plain Scala — the
  // value-roundtrip side of the oracle parity (a hash MATCH alone could
  // share a bug with an oracle that mirrors the engine's formula)
  private def cell(k: Long, i: Int): Long =
    ((CountMin.RowA(i) * k + CountMin.RowB(i)) % CountMin.P) % CountMin.Width

  private def bruteEstimate(occurrences: Seq[Long], probe: Long): Long = {
    val cnt = occurrences
      .flatMap(k => (0 until CountMin.Depth).map(i => (i, cell(k, i))))
      .groupBy(identity).map { case (rc, hits) => rc -> hits.size.toLong }
    (0 until CountMin.Depth).map(i => cnt((i, cell(probe, i)))).min
  }

  test("estimate == brute-force min-of-cells and never underestimates") {
    // skewed multiset: heavy key 7 (500x), mid key 42 (50x), long tail —
    // tail mass forces real collisions at Width=64, so the law is
    // exercised where est > exact, not only on the clean diagonal
    val occ = Seq.fill(500)(7L) ++ Seq.fill(50)(42L) ++ (100L to 400L)
    val d = occ.toDF("k").withColumn("g", lit("all"))
    val cells = CountMin.sketch(d, Seq("g"), "k")
    val probes = occ.distinct.toDF("k").withColumn("g", lit("all"))
    val est = CountMin.estimate(cells, Seq("g"), probes)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val exact = occ.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(est.keySet == exact.keySet)
    occ.distinct.foreach { k =>
      assert(est(k) == bruteEstimate(occ, k), s"k=$k")
      assert(est(k) >= exact(k), s"k=$k est=${est(k)} exact=${exact(k)}")
    }
    // the heavy keys dominate their own cells: collisions only add tail
    // mass, so the estimate stays within the CMS additive-error regime
    assert(est(7L) >= 500L && est(42L) >= 50L)
  }

  test("cell indices stay in [0, Width) across the key domain") {
    val ks = Seq(0L, 1L, 49L, 50L, 1000L, 123456789L, 2800000000L)
    for (k <- ks; i <- 0 until CountMin.Depth) {
      val c = cell(k, i)
      assert(c >= 0 && c < CountMin.Width, s"k=$k row=$i c=$c")
    }
  }

  test("merged partial sketches == flat sketch, cell-for-cell (linearity)") {
    // arbitrary 3-way partition of a skewed multiset; the sum-merge of
    // per-partition cell tables must equal the flat sketch EXACTLY (CMS
    // is linear) — the contract the catalog's merge/cube/IVM oracles
    // prove cross-engine
    val occ = Seq.fill(300)(7L) ++ (1L to 2000L) ++ Seq.fill(100)(999999999L)
    val d = occ.zipWithIndex.toDF("k", "i")
      .withColumn("g", lit("all")).withColumn("part", col("i") % 3)
    val flat = CountMin.sketch(d, Seq("g"), "k")
      .collect().map(r => ((r.getInt(1), r.getLong(2)), r.getLong(3))).toMap
    val merged = CountMin.merge(
        CountMin.sketch(d, Seq("g", "part"), "k"), Seq("g"))
      .collect().map(r => ((r.getInt(1), r.getLong(2)), r.getLong(3))).toMap
    assert(merged == flat)
  }
}
