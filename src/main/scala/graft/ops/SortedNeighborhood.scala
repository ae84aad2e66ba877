package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD 1995) — the
  * classic record-linkage candidate generator: sort all records by a
  * blocking key, pair every record with its w−1 successors in sort
  * order. Output is BOUNDED at n·(w−1) pairs by construction (compare
  * LSH's probabilistic df bounds and FastSS's structural bucket bound —
  * this family member's bound needs no hashing at all), and near-misses
  * that share a key prefix land adjacent regardless of where they differ
  * later in the string.
  *
  * The scale hazard is the GLOBAL rank: a naive `row_number() OVER
  * (ORDER BY key)` plans Exchange SinglePartition and sorts the corpus
  * on one task. [[globalRank]] is the scale-safe form (the
  * Corpus.systematicSample recipe): range-partition by the sort key,
  * collect the ≤ #partitions per-partition COUNTS (a k-row contract
  * collect), broadcast the exclusive prefix offsets back, and
  * row_number only WITHIN partitions — ranks are exact because range
  * partitions are order-contiguous and (key, id) is a total order, and
  * they are deterministic even though the sampled range boundaries are
  * not: offset + within-partition position is the same global rank
  * wherever the cuts fall. PlanSpec asserts no SinglePartition exchange
  * survives in the catalog face.
  *
  * Pairing then rides [[RangeJoin.pairsWithin]] on the rank itself
  * (delta = w−1, constant join key): every successor within the window
  * lives in the same or next rank bucket, so the candidate join is a
  * banded equi-join — two bucket keys per row, never a cross product.
  */
object SortedNeighborhood {

  /** Exact dense global rank 0..n−1 of `df` rows under (keyCol, idCol) —
    * distributed; see class doc. `idCol` must be unique (it breaks key
    * ties, making the order total). Output: (id, sk, rank). */
  def globalRank(df: DataFrame, idCol: String, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(col(keyCol).as("sk"), col(idCol).as("id"))
    val parts = spark.sparkContext.defaultParallelism.max(1).min(32)
    // pin partition ids before the double consumption (counts + window)
    val ranged = base.repartitionByRange(parts, col("sk"), col("id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(eager = true)
    val counts = ranged.groupBy("pid").agg(count(lit(1)).as("c"))
      .orderBy("pid").collect() // ≤ parts rows by contract
    val offsets = counts.map(_.getLong(1)).scanLeft(0L)(_ + _).init
    import spark.implicits._
    val offDf = counts.map(_.getInt(0)).zip(offsets).toSeq.toDF("pid", "off")
    val win = Window.partitionBy("pid").orderBy("sk", "id")
    ranged.join(F.broadcast(offDf), "pid")
      .withColumn("rank",
        row_number().over(win).cast("long") - 1L + col("off"))
      .select(col("id"), col("sk"), col("rank"))
  }

  /** Candidate pairs within a sliding window of `w` records in
    * (keyCol, idCol) sort order: (id1, id2, gap) with id1 the earlier
    * record and 0 < gap = rank2 − rank1 ≤ w−1; each pair exactly once. */
  def pairs(df: DataFrame, idCol: String, keyCol: String, w: Int): DataFrame = {
    require(w >= 2, "window must cover at least two records")
    val ranked = globalRank(df, idCol, keyCol).withColumn("all", lit(1))
    RangeJoin.pairsWithin(ranked, "all", "id", "rank", (w - 1).toLong)
      .select(col("id_a").as("id1"), col("id_b").as("id2"),
        (col("ts_b") - col("ts_a")).as("gap"))
  }
}
