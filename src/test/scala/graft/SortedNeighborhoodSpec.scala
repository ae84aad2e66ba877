package graft

import org.apache.spark.sql.functions._
import graft.ops.SortedNeighborhood

class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  // duplicate keys force the id tiebreak; 500 rows spread over many
  // input partitions so the offsets genuinely compose across ranges
  private val rows = (1L to 500L).map(i => (i, s"key${i % 97}"))

  test("distributed global rank == the sorted index, dense 0..n-1") {
    val ranked = SortedNeighborhood
      .globalRank(rows.toDF("id", "k").repartition(13), "id", "k")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val expected = rows.sortBy { case (id, k) => (k, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> i.toLong }.toMap
    assert(ranked == expected)
  }

  test("window pairs == brute-force neighborhood at w = 4") {
    val blocked = SortedNeighborhood
      .pairs(rows.toDF("id", "k").repartition(7), "id", "k", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sorted = rows.sortBy { case (id, k) => (k, id) }.map(_._1)
    val brute = (for {
      i <- sorted.indices; g <- 1 to 3 if i + g < sorted.length
    } yield (sorted(i), sorted(i + g), g.toLong)).toSet
    assert(blocked == brute && blocked.nonEmpty)
  }
}
