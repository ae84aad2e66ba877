package graft.tools

import org.apache.spark.sql.functions._

/** Prices the winnow auto-route's two regimes at 100x (r12 verdict
  * item 5 closure / stretch item 8) — the capped-vs-uncapped fork the
  * route replaced with a probe:
  *
  *  1. EXACT-replica 100x (k identical copies of every sf0.1 doc, ids
  *     shifted, text verbatim — built in memory): probe ratio = k, the
  *     route collapses families to representatives FIRST, so the capped
  *     screen runs at 1x posting volume and the family near-dup evidence
  *     SURVIVES where the naive df cap empties the join (the r12 caveat
  *     corpus, now handled automatically).
  *  2. Mutated-replica 100x (/tmp/graft_sf10, replica word mutation —
  *     textually distinct near-dup families): probe ratio ~= 1, the
  *     route correctly takes the direct capped path; on a corpus whose
  *     TRUE pair relation is quadratic-in-replicas no screen can emit
  *     o(n^2) output, and the cap is the priced defense (flat cost,
  *     template prints retired) — the regime the r12 100x note records.
  *
  * Usage: runMain graft.tools.WinnowScale [sfDir] [k] [mutatedDir]
  */
object WinnowScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 100
    val mutatedDir = if (args.length > 2) args(2) else "/tmp/graft_sf10"
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint(eager = true)
    val base = docs.agg(max(col("doc_id"))).first().getLong(0) + 1L
    val exactRep = (0 until k).map(i =>
        docs.select((col("doc_id") + lit(i * base)).as("doc_id"), col("text")))
      .reduce(_ unionByName _).localCheckpoint(eager = true)
    println(s"[winnowscale] exact-replica corpus: ${exactRep.count()} docs (k=$k)")
    val (nNaive, tNaive) = time(
      graft.pipeline.Dedup.winnowPairs(exactRep, 3, 4, 4L, 16L).count())
    println(f"[winnowscale] naive capped on exact-100x: $nNaive rows in $tNaive%.1f s" +
      " (the emptied-join regime)")
    val (nAuto, tAuto) = time(
      graft.pipeline.Dedup.winnowPairsAuto(exactRep, 3, 4, 4L, 16L).count())
    println(f"[winnowscale] auto-routed on exact-100x: $nAuto rows in $tAuto%.1f s" +
      " (probe -> dedup-first -> capped over representatives)")
    val mdocs = spark.read.parquet(s"$mutatedDir/documents.parquet")
      .select("doc_id", "text").localCheckpoint(eager = true)
    println(s"[winnowscale] mutated corpus: ${mdocs.count()} docs")
    val (nMut, tMut) = time(
      graft.pipeline.Dedup.winnowPairsAuto(mdocs, 3, 4, 4L, 16L).count())
    println(f"[winnowscale] auto-routed on mutated-100x: $nMut rows in $tMut%.1f s" +
      " (probe ~1 -> direct capped path)")
    spark.stop()
  }
}
