package graft

import org.apache.spark.sql.functions._
import graft.ops.{BloomSketch, CountMin}

class BloomSketchSpec extends SparkSpec {
  import spark.implicits._

  // plain-Scala replay of the affine row hashes — the value-roundtrip
  // side of the oracle parity (a hash MATCH alone could share a bug with
  // an oracle that mirrors the engine's formula)
  private def cell(k: Long, i: Int): Long =
    ((CountMin.RowA(i) * k + CountMin.RowB(i)) % CountMin.P) % BloomSketch.Width

  private def bruteHit(keys: Set[Long], probe: Long): Boolean = {
    val bits = keys.flatMap(k => (0 until BloomSketch.Depth).map(i => (i, cell(k, i))))
    (0 until BloomSketch.Depth).forall(i => bits((i, cell(probe, i))))
  }

  test("contains == brute-force bit test; present keys never miss; absent keys mostly reject") {
    val present = (1L to 2000L).toSet
    val absentProbes = (0 until 40).map(i => 10000000L + i * 37L)
    val d = present.toSeq.toDF("k").withColumn("g", lit("all"))
    val cells = BloomSketch.sketch(d, Seq("g"), "k")
    val probes = (present.toSeq ++ absentProbes).toDF("k")
      .withColumn("g", lit("all"))
    val hit = BloomSketch.contains(cells, Seq("g"), probes)
      .collect().map(r => r.getLong(1) -> r.getBoolean(2)).toMap
    // no false negatives — every present key tests positive
    present.foreach(k => assert(hit(k), s"false negative at k=$k"))
    // every probe (present or absent) matches the brute-force replay
    (present.toSeq ++ absentProbes).foreach { k =>
      assert(hit(k) == bruteHit(present, k), s"k=$k")
    }
    // selectivity sanity: at 2000 keys / 8192 cells-per-row occupancy the
    // expected false-positive rate is ~(0.2)^4 ≈ 2e-3, so the 40 absent
    // probes must be overwhelmingly rejected (allow <= 2 deterministic
    // collisions before calling the width regression-broken)
    val fps = absentProbes.count(hit(_))
    assert(fps <= 2, s"$fps/40 absent probes accepted — filter saturated?")
  }

  test("OR-merge of partials == flat filter, bit-for-bit, and is idempotent") {
    val occ = (1L to 1500L) ++ (1L to 500L) // overlapping multiset
    val d = occ.zipWithIndex.toDF("k", "i")
      .withColumn("g", lit("all")).withColumn("part", col("i") % 3)
    val flat = BloomSketch.sketch(d, Seq("g"), "k")
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    val parts = BloomSketch.sketch(d, Seq("g", "part"), "k")
    val merged = BloomSketch.merge(parts, Seq("g"))
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(merged == flat)
    // idempotence: re-merging the already-merged filter with one of its
    // own partials changes nothing (at-least-once replay safety — the
    // law the linear CMS does not have)
    val replayed = BloomSketch.merge(
        BloomSketch.merge(parts, Seq("g")).unionByName(
          parts.filter(col("part") === 0).drop("part")), Seq("g"))
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(replayed == flat)
  }
}
