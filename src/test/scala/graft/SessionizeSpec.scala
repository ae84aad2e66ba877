package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  /** the plain q_events_sessionize formulation (one per-user window),
    * inlined as the reference the chunked plan must equal row-for-row */
  private def plain(events: DataFrame, gapMs: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("ms", expr("ts div 1000000"))
      .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum("new_sess").over(run))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min(expr("ts div 1000")).as("t_start_us"),
        max(expr("ts div 1000")).as("t_end_us"))
  }

  private def toRows(df: DataFrame): Seq[(Long, Long, Long, Long, Long)] =
    df.select("user_id", "session_idx", "n_events", "t_start_us", "t_end_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sorted

  private def ev(rows: Seq[(Long, Long, Long)]): DataFrame =
    // (user_id, event_id, ms) -> ts in nanos, the Tables.events canonical
    rows.toDF("user_id", "event_id", "ms")
      .select(col("user_id"), col("event_id"), (col("ms") * 1000000L).as("ts"))

  test("chunked ≡ plain on crafted boundaries (gap 10ms, chunk 25ms)") {
    val fixture = ev(Seq(
      // user 1: dense run every 5ms from 0..70 — ONE session spanning
      // chunks 0,1,2 (each boundary gap 5 <= 10); then 81 (gap 11 > 10,
      // new session in the same chunk 3); then 106 (gap 25 > 10, new
      // session opening chunk 4 — boundary NON-merge with prev in chunk 3)
      (1L, 1L, 0L), (1L, 2L, 5L), (1L, 3L, 10L), (1L, 4L, 15L), (1L, 5L, 20L),
      (1L, 6L, 25L), (1L, 7L, 30L), (1L, 8L, 35L), (1L, 9L, 40L), (1L, 10L, 45L),
      (1L, 11L, 50L), (1L, 12L, 55L), (1L, 13L, 60L), (1L, 14L, 65L), (1L, 15L, 70L),
      (1L, 16L, 81L), (1L, 17L, 106L),
      // user 2: boundary merge exactly AT the gap (24 -> 34, gap 10 <= 10
      // across the chunk-1 boundary); then a >1-empty-chunk jump to 120
      (2L, 21L, 24L), (2L, 22L, 34L), (2L, 23L, 120L),
      // user 2 tie: same ms, order decided by event_id within the chunk
      (2L, 24L, 120L),
      // user 3: single event (single chunk, single session)
      (3L, 31L, 7L)))
    assert(toRows(Sessionize.chunked(fixture, gapMs = 10L, chunkMs = 25L))
      == toRows(plain(fixture, gapMs = 10L)))
  }

  test("chunked ≡ plain on a randomized hot-user log") {
    val rng = new scala.util.Random(7)
    // user 0 is the bot with half the events — the shape the operator
    // exists for; ms spans NEGATIVES to pin the floor-chunking (truncation
    // would fold chunks -0.x and 0.x together and mis-order the stitch)
    val rows = (1 to 600).map { i =>
      val u = if (rng.nextBoolean()) 0L else 1L + rng.nextInt(5)
      (u, i.toLong, (rng.nextInt(2000) - 1000).toLong)
    }
    val fixture = ev(rows)
    assert(toRows(Sessionize.chunked(fixture, gapMs = 10L, chunkMs = 25L))
      == toRows(plain(fixture, gapMs = 10L)))
  }

  test("chunkMs must exceed gapMs (the adjacent-chunks-only merge argument)") {
    intercept[IllegalArgumentException](
      Sessionize.chunked(ev(Seq((1L, 1L, 0L))), gapMs = 25L, chunkMs = 25L))
  }
}
