package graft.tools

/** Prices BPE training at a REALISTIC vocabulary size — the round-11
  * verdict's last driver-side bottleneck evidence item. `Bpe.train` is
  * correct but pays one 1-row argmax collect PER MERGE (32k merges = 32k
  * sequential Spark jobs at any data scale); `Bpe.trainBatched` pays one
  * B-row collect per round. This main measures both on real documents and
  * prints the extrapolated sequential cost next to the measured batched
  * cost, so BASELINE.md carries a recorded driver-latency collapse, not a
  * claim.
  *
  * Usage: runMain graft.tools.BpeScale [sfDir] [rounds] [batch] [plainMerges]
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 16
    val batch = if (args.length > 2) args(2).toInt else 64
    val plainMerges = if (args.length > 3) args(3).toInt else 64
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.documents(spark, sfDir)
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (mB, tB) = time {
      val (m, _) = graft.pipeline.Bpe.trainBatched(docs, rounds, batch)
      m.count()
    }
    println(f"[bpescale] batched: rounds=$rounds batch=$batch merges=$mB " +
      f"time=$tB%.1fs (${tB / rounds}%.2f s/round)")
    val (mP, tP) = time {
      val (m, _) = graft.pipeline.Bpe.train(docs, plainMerges)
      m.count()
    }
    println(f"[bpescale] plain:   merges=$plainMerges learned=$mP " +
      f"time=$tP%.1fs (${tP / plainMerges}%.2f s/merge)")
    println(f"[bpescale] extrapolated plain at $mB merges = " +
      f"${tP / plainMerges * mB}%.0f s vs batched $tB%.1f s " +
      f"(${tP / plainMerges * mB / tB}%.1fx)")
    spark.stop()
  }
}
