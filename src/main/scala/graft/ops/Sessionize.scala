package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-user-safe sessionization.
  *
  * The plain sessionize plan (q_events_sessionize) runs ONE window
  * partitioned by user: every event moves once — the sessionize floor —
  * but a window partition is indivisible (AQE's skew machinery splits
  * shuffle-join partitions, never a running window), so one bot user
  * owning 25% of a 100 TB log puts 25 TB through a single task's sort.
  * The round-11 skew sweep measured the onset locally: 1.12x at 25%
  * severity, 1.44x at 50% — growing with severity because the hot
  * partition serializes while the rest of the machine idles.
  *
  * This variant bounds any task's slice at chunk-width × event-rate:
  *
  *  1. LOCAL pass: sessions within (user, time-chunk) — the same
  *     lag/flag/running-sum plan, partitioned by (user_id, ms div chunkMs),
  *     so the hot user's events spread across its chunks.
  *  2. STITCH pass: a session crosses a chunk boundary iff the boundary
  *     gap ≤ gapMs. With chunkMs > gapMs, ONLY ADJACENT chunks can merge
  *     (a session bridging chunk c-2 to c would have to cross the entire
  *     empty chunk c-1, a gap ≥ chunkMs > gapMs), so the merge decision
  *     is a lag over the per-(user, chunk) summary — a relation
  *     events/chunk-width smaller than the log (the hot user contributes
  *     #chunks rows, not #events). Global numbering: local session i of
  *     chunk c gets Σ_{c'<c} n_local(c') − Σ_{c'≤c} merge(c') + i, which
  *     assigns a boundary-crossing session the SAME id on both sides;
  *     the final group-by fuses its halves.
  *
  * Cost: one extra shuffle on (user, chunk) + one summary-sized window vs
  * the plain plan — the price of skew immunity. Output is exactly the
  * plain plan's (user_id, session_idx, n_events, t_start_us, t_end_us),
  * and q_events_sessionize_chunked hash-matches q_events_sessionize's
  * DuckDB oracle — the equivalence is certified, not argued.
  *
  * `events` needs (user_id, event_id, ts) with ts in nanos (the
  * Tables.events canonical form); ordering ties break on event_id like
  * the plain plan.
  */
object Sessionize {

  def chunked(events: DataFrame, gapMs: Long = 1800000L,
      chunkMs: Long = 14400000L): DataFrame = {
    require(chunkMs > gapMs,
      s"chunkMs ($chunkMs) must exceed gapMs ($gapMs): the adjacent-chunks-" +
        "only merge argument needs any skipped chunk to be wider than the gap")
    val e = events.select(col("user_id"), col("event_id"), col("ts"))
      // ms via div matches the plain plan's `ts div 1000000` exactly (ts is
      // positive epoch-nanos by the Tables.events contract); the CHUNK uses
      // exact integer FLOOR division (pmod ≥ 0) so even a pre-epoch ts
      // chunks correctly — truncation would fold chunks -0.x and 0.x
      // together and mis-order the stitch (the asOfChunked convention)
      .withColumn("ms", expr("ts div 1000000"))
      .withColumn("chunk", expr(s"(ms - pmod(ms, ${chunkMs}L)) div ${chunkMs}L"))
    val wChunk = Window.partitionBy("user_id", "chunk").orderBy("ts", "event_id")
    val local = e
      .withColumn("prev_ms", lag(col("ms"), 1).over(wChunk))
      .withColumn("new_sess",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("local_idx", sum("new_sess").over(
        wChunk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // summary from the RAW events, not from `local`: the summary branch
    // feeds the stitch while `local` feeds the final join, and deriving
    // both from the window plan runs the event-sized sort+window TWICE
    // (ReuseExchange shares the exchange, never the WindowExec — measured
    // as the premium growing 2.0x → 3.1x from sf0.1 to 100x). n_local =
    // 1 + #(sorted consecutive gaps > gapMs), a fold over the chunk's
    // sorted ms list: ties at equal ms leave every gap decision unchanged,
    // so the fold and the (ts, event_id)-ordered window count identically.
    // Memory contract: collect_list buffers ONE (user, chunk)'s ms values
    // on the agg task — the same chunk-width × arrival-rate bound the
    // operator already imposes on the window sort.
    val summary = e.groupBy("user_id", "chunk")
      .agg(min("ms").as("first_ms"), max("ms").as("last_ms"),
        sort_array(collect_list(col("ms"))).as("mss"))
      .withColumn("n_local",
        expr(s"aggregate(slice(mss, 2, size(mss)), " +
          s"named_struct('prev', mss[0], 'n', 1L), " +
          s"(acc, x) -> named_struct('prev', x, " +
          s"'n', acc.n + CASE WHEN x - acc.prev > ${gapMs}L THEN 1 ELSE 0 END), " +
          "acc -> acc.n)"))
      .drop("mss")
    val wUser = Window.partitionBy("user_id").orderBy("chunk")
    val offsets = summary
      .withColumn("prev_chunk", lag("chunk", 1).over(wUser))
      .withColumn("prev_last_ms", lag("last_ms", 1).over(wUser))
      .withColumn("merge",
        when(col("prev_chunk").isNotNull
          && col("chunk") - col("prev_chunk") === 1L
          && col("first_ms") - col("prev_last_ms") <= gapMs, 1L).otherwise(0L))
      .withColumn("offset",
        coalesce(sum("n_local").over(
          wUser.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          - sum("merge").over(
            wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("user_id", "chunk", "offset")
    local.join(offsets, Seq("user_id", "chunk"))
      .withColumn("session_idx", col("offset") + col("local_idx"))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min(expr("ts div 1000")).as("t_start_us"),
        max(expr("ts div 1000")).as("t_end_us"))
  }
}
