package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming corpus-ingest operators — the incremental faces of the batch
  * Corpus allocation passes, for the pipeline shape where documents arrive
  * continuously and admission decisions cannot wait for a corpus scan.
  */
object CorpusStreams {

  final case class DocTokens(doc_id: Long, source: String, n_tokens: Long)
  final case class Admitted(doc_id: Long, source: String, n_tokens: Long, cum_tokens: Long)

  /** Streaming token-budget admission — the stateful twin of
    * [[graft.pipeline.Corpus.tokenBudgetMixture]]: documents stream in and
    * each source admits while its RUNNING token total stays within a
    * static quota (the batch pass owns its order via content hash; a
    * stream must decide online, so arrival order is the contract —
    * within one micro-batch, doc_id order makes the decision
    * deterministic and replayable). Per-source state is ONE long (tokens
    * used), hash-partitioned by source — bounded regardless of stream
    * length, the smallest possible streaming state. A doc that would
    * overflow the quota is dropped, but smaller later docs may still fit
    * (first-fit, not prefix — a stream cannot reorder what it has not
    * seen); docs from sources without a quota are dropped.
    *
    * At 100 TB-ingest: admission is where over-represented sources get
    * throttled at the door instead of paying storage + a later mixture
    * pass; the state store holds |sources| longs.
    *
    * MEMORY CONTRACT (transient, distinct from the one-long state claim):
    * the deterministic within-batch ordering buffers ONE source's slice of
    * ONE micro-batch on the owning task (`it.toSeq.sortBy`) — ~48 B/doc of
    * (id, src-ref, tokens) triples, so ~2M docs/source/trigger per GiB of
    * task heap. A skewed source in an unbounded trigger can exceed that;
    * bound the trigger (`maxFilesPerTrigger` / rate limit) so
    * docs-per-source-per-batch stays under ~10M, the same kill-switch
    * discipline as TopKPerKey's heap budget. StreamingSpec pins a
    * deliberately large single-source batch (50k docs, one group) green.
    */
  def admitWithinBudget(docs: Dataset[DocTokens],
      quotas: Map[String, Long]): Dataset[Admitted] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, it: Iterator[DocTokens], state: GroupState[Long]) =>
          val quota = quotas.getOrElse(src, 0L)
          var used = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[Admitted]
          // micro-batch iterators carry no order promise; doc_id order
          // makes the within-batch decision deterministic
          it.toSeq.sortBy(_.doc_id).foreach { d =>
            if (used + d.n_tokens <= quota) {
              used += d.n_tokens
              out += Admitted(d.doc_id, src, d.n_tokens, used)
            }
          }
          state.update(used)
          out.result().iterator
      }
  }

  final case class DocFp(doc_id: Long, fp_hi: Long, fp_lo: Long, len: Long)

  /** Streaming exact-dedup admission — the stateful twin of
    * [[graft.pipeline.Dedup.exactByFingerprint128]]: documents stream in
    * and the FIRST occurrence of each content fingerprint is admitted;
    * every later copy (same micro-batch or any later one) is dropped at
    * the door. Within a micro-batch the lowest doc_id wins, so the
    * decision is deterministic and replayable (the admitWithinBudget
    * convention); across batches arrival order is the contract — a
    * stream cannot prefer a copy it has not seen. Keyed by the 128-bit
    * fingerprint + length (the same no-payload-shuffle trick as the
    * batch pass: only 32 B/doc reaches the state store lookup, never
    * text). Group memory is O(1): the winner is a running min over the
    * iterator, nothing buffers.
    *
    * STATE CONTRACT: one long (keeper doc_id) per DISTINCT fingerprint —
    * unlike admitWithinBudget's |sources| longs this grows with the
    * corpus, which is the irreducible cost of exact online dedup. At
    * 100 TB that is ~8 GB of state per 10^9 distinct documents (fine for
    * a state store, partitioned by fingerprint hash); when the corpus
    * outgrows that, the production shape is the stored-index batch fold
    * ([[graft.pipeline.Dedup.incrementalDeduplicate]] per trigger via
    * foreachBatch, the substringIngest pattern), or a state TTL when
    * "duplicate within a window" is the actual requirement. */
  def exactDedupScreen(docs: DataFrame): Dataset[DocFp] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        graft.functions.GraftFunctions.polyHash(col("text")).as("fp_hi"),
        graft.functions.GraftFunctions.polyHash2(col("text")).as("fp_lo"),
        length(col("text")).cast("long").as("len"))
      .as[DocFp]
      .groupByKey(d => (d.fp_hi, d.fp_lo, d.len))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Long, Long, Long), it: Iterator[DocFp], state: GroupState[Long]) =>
          if (state.exists) { it.foreach(_ => ()); Iterator.empty }
          else {
            val first = it.minBy(_.doc_id)
            state.update(first.doc_id)
            Iterator.single(first)
          }
      }
  }

  /** Streaming substring-dedup ingest: each micro-batch of documents is
    * checked against the stored gram index
    * ([[graft.pipeline.Dedup.substringIndex]]) for verbatim shared spans —
    * the batch-vs-index join of
    * [[graft.pipeline.Dedup.incrementalSubstringSpans]], run per trigger
    * via foreachBatch (diagonal-run detection needs a window function, so
    * the per-batch relational form IS the production shape; the stream
    * holds NO state — the index is the state, owned by the caller's
    * storage). Spans found per batch are appended to `spansDir`; the
    * micro-batch's own grams are appended to `indexDir` AFTER the span
    * check, so later batches see earlier batches through the growing
    * index (exactly the incremental contract, one batch at a time) —
    * the union of all batches' spans equals the full batch run's span
    * set. One caveat, documented as the online-decision contract (the
    * admitWithinBudget convention): the hot-gram postings cap is computed
    * per trigger over PREFIX counts (index-so-far + batch), so a gram
    * that only becomes hot in the final union can anchor early-batch
    * spans the one-shot run would drop; with the cap effectively off the
    * stream total is exactly the batch total (StreamingSpec proves it). */
  def substringIngest(docs: DataFrame, indexDir: String, spansDir: String,
      checkpointDir: String, k: Int = 8, minLen: Int = 16,
      maxOcc: Long = 1000L): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val b = batch.localCheckpoint(eager = true)
        val idxPath = new org.apache.hadoop.fs.Path(indexDir)
        val fs = idxPath.getFileSystem(sp.sparkContext.hadoopConfiguration)
        val index =
          if (fs.exists(idxPath)) sp.read.parquet(indexDir)
          else sp.emptyDataFrame.select(lit(0L).as("doc_id"), lit(0L).as("pos"),
            lit(0L).as("h")).limit(0)
        val spans = graft.pipeline.Dedup
          .incrementalSubstringSpans(index, b, k, minLen, maxOcc)
          .localCheckpoint(eager = true)
        spans.write.mode("append").parquet(spansDir)
        // index grows only after the check: a batch never matches itself
        // through the index (its internal pairs come from the batch side)
        graft.pipeline.Dedup.substringIndex(b, k)
          .write.mode("append").parquet(indexDir)
        ()
      }
      .start()

  /** documents frame → (doc_id, source, n_tokens) with the same BPE-ish
    * token estimate as the batch allocator; works on static AND streaming
    * frames (pure projection). */
  def withTokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      expr(s"aggregate(${graft.pipeline.TextHash.wordsSpark("text")}, " +
        "CAST(0 AS BIGINT), (acc, w) -> acc + (length(w) + 3) div 4)").as("n_tokens"))
}
