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

  test("chunked ≡ plain: random keys/ts incl. negatives, carries across empty chunks, ties") {
    // negative ts exercise the FLOOR chunk division (truncation would shift
    // chunk -0.x to 0 and break carry ordering); chunkSize 64 over
    // ts ∈ [-999, 999] gives ~30 chunks with plenty of empty ones per key,
    // so most left rows resolve through the carry, not the local fill
    val rng = new scala.util.Random(42)
    val keys = Seq(1L, 2L, 3L)
    val left = (1 to 400).map { i =>
      (keys(rng.nextInt(3)), rng.nextLong() % 1000L, s"l$i")
    }.toDF("k", "t", "lid")
    val right = (1 to 150).map { i =>
      (keys(rng.nextInt(3)), rng.nextLong() % 1000L, s"r$i")
    }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique per (k, t)
      .toDF("k", "t", "rid")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, String, Option[String])] =
      df.select("k", "t", "lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), Option(r.getString(3))))
        .toSeq.sorted
    assert(rows(AsOfJoin.asOfChunked(left, right, "k", "t", chunkSize = 64L))
      == rows(AsOfJoin.asOf(left, right, "k", "t")))
  }

  test("chunked: inclusive tie at a chunk boundary and null-payload row still win") {
    // right row AT ts 10 = the first instant of chunk 1 (chunkSize 10):
    // the left row at the same instant must match it through the LOCAL
    // fill, not a stale carry; and the null-payload semantics carry over
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b")).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, Some(7L)), (1L, 20L, Option.empty[Long]))
      .toDF("k", "t", "v")
    val out = AsOfJoin.asOfChunked(left, right, "k", "t", chunkSize = 10L)
      .collect().map(r => r.getString(r.fieldIndex("lid")) ->
        (if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getLong(r.fieldIndex("v"))))).toMap
    assert(out == Map("a" -> Some(7L), "b" -> None))
  }
}
