package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share word
  * n-grams with an evaluation/benchmark set, so eval data can be scrubbed
  * from the training corpus before training (the GPT-3-style "13-gram
  * overlap" check, here over the 3-word shingles the dedup stack already
  * hashes).
  *
  * Scale design: the eval side of the join is a benchmark suite — thousands
  * of documents against a 100 TB corpus — so its distinct gram-hash set is
  * broadcast and the corpus side never shuffles: one scan, a broadcast hash
  * probe per gram, and a partial-aggregated count per contaminated doc.
  * Gram hashes are TextHash integer arithmetic (shared with the DuckDB
  * oracle), not engine-native hashes. If the eval set ever outgrows a
  * broadcast, drop the hint and the same plan shuffle-joins on the gram
  * hash.
  */
object Decontam {

  /** (doc_id, n_shared) for every training document sharing at least one
    * distinct 3-gram hash with `evalDocs`. `n_shared` counts DISTINCT
    * shared grams (both gram relations are distinct per doc). */
  def overlapCounts(trainDocs: DataFrame, evalDocs: DataFrame): DataFrame = {
    val trainGrams = Dedup.shingleHashes(trainDocs)
      .select(col("doc_id"), explode(col("hs")).as("g"))
    val evalGrams = Dedup.shingleHashes(evalDocs)
      .select(explode(col("hs")).as("g")).distinct()
    trainGrams.join(broadcast(evalGrams), Seq("g"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
  }

  /** The decontaminated corpus: training docs with zero eval-gram overlap.
    * The anti-join ships only contaminated ids — payloads never shuffle. */
  def decontaminate(trainDocs: DataFrame, evalDocs: DataFrame): DataFrame =
    trainDocs.join(overlapCounts(trainDocs, evalDocs).select("doc_id"),
      Seq("doc_id"), "left_anti")

  /** The benchmark's distinct gram-hash set, collected to the driver for
    * the streaming filter (benchmark suites are thousands of docs — the
    * collect is small by the same argument that lets batch decontamination
    * broadcast this set). */
  def evalGramSet(evalDocs: DataFrame): Array[Long] =
    Dedup.shingleHashes(evalDocs).select(explode(col("hs")).as("g"))
      .distinct().collect().map(_.getLong(0))

  /** Stateless streaming decontamination: drop any incoming document whose
    * gram set overlaps the benchmark grams. One codegen'd per-row
    * shingle-hash + arrays_overlap against the literal gram array — no
    * streaming state, no watermark interaction, ingest-rate scaling. Works
    * identically on batch frames (used by the streaming≡batch spec). */
  def decontaminateStreaming(docs: DataFrame, evalGrams: Array[Long]): DataFrame =
    docs
      .withColumn("__hs", graft.functions.GraftFunctions.shingleHashes(col("text")))
      .filter(!arrays_overlap(col("__hs"), typedlit(evalGrams.toSeq)))
      .drop("__hs")
}
