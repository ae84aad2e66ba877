package graft

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join: inclusive match, latest-not-after, unmatched stays null") {
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"), (1L, 4L, "d"))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 10L, "X"), (1L, 20L, "Y"), (3L, 1L, "Z"))
      .toDF("k", "t", "rid")
    val out = AsOfJoin.asOf(left, right, "k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)) -> Option(r.getString(3))).toMap
    // mirrors the DuckDB ASOF LEFT JOIN reference output exactly
    assert(out == Map(
      (1L, 4L, "d") -> None,         // before any right row
      (1L, 10L, "a") -> Some("X"),   // inclusive at equal ts
      (1L, 25L, "b") -> Some("Y"),   // latest <= 25 is 20
      (2L, 5L, "c") -> None))        // key with no right rows
  }

  test("a matched right row with NULL payload wins over a stale non-null row") {
    // DuckDB ASOF semantics: the latest-not-after ROW matches, even if its
    // payload value is null — a naive per-column ignoreNulls fill would
    // leak the older row's 5
    val left = Seq((1L, 25L, "a")).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, Some(5L)), (1L, 20L, Option.empty[Long]))
      .toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t").collect().head
    assert(out.isNullAt(out.fieldIndex("v")), out.toString)
  }

  test("multi-column payload never mixes values from different right rows") {
    val left = Seq((1L, 25L, "a")).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, Some("x1"), Some("y1")), (1L, 20L, Option.empty[String], Some("y2")))
      .toDF("k", "t", "p", "q")
    val out = AsOfJoin.asOf(left, right, "k", "t").collect().head
    assert(out.isNullAt(out.fieldIndex("p")) && out.getString(out.fieldIndex("q")) == "y2")
  }

  test("as-of join rejects colliding payload column names") {
    val l = Seq((1L, 1L, "x")).toDF("k", "t", "v")
    val r = Seq((1L, 1L, "y")).toDF("k", "t", "v")
    intercept[IllegalArgumentException](AsOfJoin.asOf(l, r, "k", "t"))
  }
}
