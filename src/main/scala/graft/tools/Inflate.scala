package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Dev-only scale-sweep data generator (not part of the driver contract):
  * writes a K-times inflated copy of a testdata directory so the bench can
  * measure how per-query cost scales with data volume (BASELINE.md's
  * measured-curve table).
  *
  * Inflation model — "more of the same, not denser":
  *  - FACT tables replicate K times with primary keys shifted per replica
  *    (orderkey/event_id/user_id/doc_id/vec_id + i*(max+1)), so key-grouped
  *    work gets K times more GROUPS of the same size, matching how real
  *    volume arrives. Foreign keys into dims stay in range.
  *  - DIM tables (region/nation/customer/supplier/part) copy unchanged —
  *    dims grow slower than facts in every warehouse, and this preserves
  *    broadcast-ability, which is the plan property under test.
  *  - documents replace every 3rd word with a replica-tagged token
  *    (replica 0 stays byte-identical): every 3-word shingle then contains
  *    a replaced word, so cross-replica shingle sets are DISJOINT — no
  *    artificial near-dup candidates (an appended-filler variant measured
  *    13x at K=10: Jaccard ~0.55 is LSH's worst spot, flooding the verify
  *    stage with failing candidates), text length and per-doc statistics
  *    unchanged, and each replica keeps its own copy of the corpus's true
  *    near-dup pairs — the real workload, K times over.
  *  - embeddings apply a per-replica random-SIGN-FLIP isometry (replica 0
  *    unchanged): a fixed diagonal ±1 matrix per replica preserves every
  *    intra-replica norm and cosine EXACTLY (so each replica carries the
  *    corpus's true near-dup pairs), while cross-replica cosines become
  *    random ±v·w walks, |cos| ~ N(0, 1/sqrt(64)) ≈ 0.125 — 3σ under the
  *    0.40 dedup threshold. Replicating unchanged instead measured 26x at
  *    K=10: every vector gets K identical twins, so TRUE duplicate pairs
  *    grow K²-fold — an inflation artifact, not a plan property.
  *
  * Graph queries derive edges by MODULO cuts of lineitem, so inflation
  * densifies their graphs instead of growing them — their sweep ratios
  * measure saturation, not scale; annotated as such in BASELINE.md.
  */
object Inflate {
  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$inDir/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$t.parquet")

    def replicate(df: DataFrame, shifted: Seq[String]): DataFrame = {
      val bases = shifted.map(c => c -> (df.agg(max(col(c))).first().getLong(0) + 1L)).toMap
      (0 until k).map { i =>
        shifted.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * bases(c))))
      }.reduce(_ unionByName _)
    }

    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      write(read(t), t)
    }
    write(replicate(read("lineitem"), Seq("l_orderkey")), "lineitem")
    write(replicate(read("orders"), Seq("o_orderkey")), "orders")
    write(replicate(read("events"), Seq("event_id", "user_id")), "events")
    // embeddings: shift ids + per-replica sign-flip isometry (see scaladoc)
    val emb = read("embeddings")
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val vecBase = emb.agg(max(col("vec_id"))).first().getLong(0) + 1L
    val embReplicas = (0 until k).map { i =>
      val d = emb.withColumn("vec_id", col("vec_id") + lit(i * vecBase))
      if (i == 0) d
      else {
        val rng = new scala.util.Random(0xC0FFEE + i)
        val signs = Seq.fill(dim)(if (rng.nextBoolean()) 1.0f else -1.0f)
        d.withColumn("embedding",
          zip_with(col("embedding"), typedLit(signs), (v, s) => v * s))
      }
    }
    write(embReplicas.reduce(_ unionByName _), "embeddings")

    // documents: shift ids, then de-correlate replica text (see scaladoc)
    val docs = read("documents")
    val base = docs.agg(max(col("doc_id"))).first().getLong(0) + 1L
    val replicas = (0 until k).map { i =>
      val d = docs.withColumn("doc_id", col("doc_id") + lit(i * base))
      if (i == 0) d
      else d.withColumn("text",
          expr(s"concat_ws(' ', transform(split(text, ' '), (w, j) -> " +
            s"CASE WHEN j % 3 = 2 THEN concat('r$i', 'x', j) ELSE w END))"))
        .withColumn("n_chars", length(col("text")))
    }
    write(replicas.reduce(_ unionByName _), "documents")

    println(s"[inflate] wrote ${k}x $inDir -> $outDir")
    spark.stop()
  }
}
