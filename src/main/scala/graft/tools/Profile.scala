package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.Tables
import graft.pipeline.Dedup

/** Dev-only stage profiler (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    if (args.contains("--coalesce"))
      b.config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    if (args.contains("--noaqe")) b.config("spark.sql.adaptive.enabled", "false")
    if (args.contains("--p8")) b.config("spark.sql.shuffle.partitions", "8")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$n")
    }
    val docs = Tables.documents(spark, sfDir)
    docs.count()
    if (args.contains("--iter")) {
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val stages = new java.util.concurrent.atomic.AtomicInteger
      val tasks = new java.util.concurrent.atomic.AtomicInteger
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
        }
      })
      def report(label: String): Unit = {
        println(s"[profile] $label: jobs=${jobs.getAndSet(0)} stages=${stages.getAndSet(0)} tasks=${tasks.getAndSet(0)}")
      }
      t("pagerank k=20 x10")(graft.graph.PageRank.run(
        graft.graph.Graphs.kChain(spark, 20), 10, 0L, 400L).count())
      report("pagerank cold")
      t("pagerank again")(graft.graph.PageRank.run(
        graft.graph.Graphs.kChain(spark, 20), 10, 0L, 400L).count())
      report("pagerank warm")
      t("sssp")(graft.graph.ShortestPath.run(
        graft.graph.Graphs.lineitemEdges(spark, sfDir, 300), 1L).count())
      report("sssp")
      t("cc doubling")(graft.graph.Graphs.connectedComponentsDoubling(
        graft.graph.Graphs.lineitemEdges(spark, sfDir, 300)).count())
      report("cc doubling")
      t("cc doubling again")(graft.graph.Graphs.connectedComponentsDoubling(
        graft.graph.Graphs.lineitemEdges(spark, sfDir, 300)).count())
      report("cc doubling warm")
    } else if (args.contains("--shuffle")) {
      // per-query shuffle volume — the measured basis for the "dims
      // broadcast; only the pre-filtered facts shuffle" claims in
      // BASELINE.md. (Task input metrics are unreliable for local-fs
      // parquet scans, so only shuffle bytes are reported.) Listener
      // events are async: drain before reading.
      val sw = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      })
      val names = Seq("q_tpch_q1", "q_tpch_q5", "q_tpch_q18", "q_join_broadcast",
        "q_dedup_minhash", "q_dedup_exact_fp", "q_decontaminate", "q_heavy_hitters",
        "q_topk_per_key", "q_corpus_fingerprint",
        "q_dedup_simhash", "q_dedup_embedding",
        "q_events_window", "q_events_sessionize", "q_events_pairs", "q_asof_join",
        "q_dedup_semantic", "q_mixture_budget")
      names.foreach { name =>
        graft.SparkEntry.queries(name)(spark, sfDir) // plan once to warm catalogs
        sw.set(0)
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        // listener events are async and a fixed sleep undercounts under
        // load — poll until the counter is stable for 3 consecutive reads
        var last = -1L; var stable = 0; var waited = 0
        while (stable < 3 && waited < 100) {
          Thread.sleep(100); waited += 1
          val now = sw.get
          if (now == last) stable += 1 else { stable = 0; last = now }
        }
        println(f"[shuffle] $name%-24s shuffleWrite=${sw.get / 1048576.0}%8.2f MiB")
      }
    } else if (args.contains("--topkboundary")) {
      // marginal cost of one non-codegen InternalRow iterator boundary —
      // the overhead TopKPerKeyExec's two passes add versus a hypothetical
      // fused (whole-stage-codegen) implementation. Measured by stacking
      // identity mapPartitions layers on the operator's own input shape
      // and taking the per-layer slope; recorded in BASELINE.md.
      val o = Tables.orders(spark, sfDir).select("o_custkey", "o_orderkey", "o_totalprice")
      val nRows = o.count()
      val base = o.queryExecution.toRdd
      val Layers = 5
      val layered = (1 to Layers).foldLeft(base)((r, _) => r.mapPartitions(identity))
      def iterate(rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]): Unit =
        rdd.foreachPartition { it => while (it.hasNext) it.next() }
      iterate(base); iterate(layered) // warm
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val tb = (1 to 5).map(_ => time(iterate(base))).min
      val tl = (1 to 5).map(_ => time(iterate(layered))).min
      val perLayerMs = (tl - tb) / Layers * 1000
      println(f"[topkboundary] rows=$nRows base=$tb%.4f s +$Layers layers=$tl%.4f s" +
        f" => per-boundary ~ $perLayerMs%.2f ms (x2 boundaries for the operator)")
      // 100x the bench rows to resolve the per-row slope above timer noise
      import org.apache.spark.sql.functions.col
      val big = spark.range(0, 15000000L)
        .select((col("id") % 1500).as("k"), col("id").as("v"), (col("id") * 7 % 1000).as("p"))
      val bigRdd = big.queryExecution.toRdd
      val bigLayered = (1 to Layers).foldLeft(bigRdd)((r, _) => r.mapPartitions(identity))
      iterate(bigRdd); iterate(bigLayered)
      val tb2 = (1 to 3).map(_ => time(iterate(bigRdd))).min
      val tl2 = (1 to 3).map(_ => time(iterate(bigLayered))).min
      println(f"[topkboundary] rows=15000000 base=$tb2%.4f s +$Layers layers=$tl2%.4f s" +
        f" => per-boundary ~ ${(tl2 - tb2) / Layers * 1000}%.2f ms" +
        f" (~${(tl2 - tb2) / Layers / 15e6 * 1e9}%.2f ns/row)")
    } else if (args.contains("--cold")) {
      t("full minhashDedup (cold)")(Dedup.minhashDedup(docs, 0.8).count())
    } else if (args.contains("--hot")) {
      val emb = Tables.embeddings(spark, sfDir)
      emb.count()
      t("simhashDedup run1")(Dedup.simhashDedup(docs, 3).count())
      t("simhashDedup run2")(Dedup.simhashDedup(docs, 3).count())
      t("embNearDup run1")(graft.pipeline.Similarity.lshNearDup(emb, 0.4).count())
      t("embNearDup run2")(graft.pipeline.Similarity.lshNearDup(emb, 0.4).count())
      t("minhash run1")(Dedup.minhashDedup(docs, 0.8).count())
      t("minhash run2")(Dedup.minhashDedup(docs, 0.8).count())
    } else if (args.contains("--simhash")) {
      import org.apache.spark.sql.functions._
      import graft.pipeline.TextHash._
      val sigs = Dedup.simhashSignatures(docs).persist()
      t("sigs persist+count")(sigs.count())
      val nBands = simBandsFor(3)
      val bandStructs = (0 until nBands).map(b =>
        struct(lit(b).as("band"), expr(simBandSpark("sim", b, nBands)).as("key")))
      val bands = sigs
        .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      t("bands")(bands.count())
      val a = bands.toDF("doc_a", "band", "key")
      val b = bands.toDF("doc_b", "band", "key")
      val rawCand = a.join(b, Seq("band", "key")).filter(col("doc_a") < col("doc_b"))
      t("raw candidates")(rawCand.count())
      val cand = rawCand.select("doc_a", "doc_b").distinct()
      t("distinct cand")(cand.count())
      val cc = cand.persist(); cc.count()
      t("rejoin+hamming (on cached)")(cc
        .join(sigs.select(col("doc_id").as("doc_a"), col("sim").as("sim_a")), "doc_a")
        .join(sigs.select(col("doc_id").as("doc_b"), col("sim").as("sim_b")), "doc_b")
        .withColumn("hamming", expr("CAST(bit_count(sim_a ^ sim_b) AS BIGINT)"))
        .filter(col("hamming") <= 3).count())
      t("full simhashDedup")(Dedup.simhashDedup(docs, 3).count())
    } else {
      t("shingleHashes")(Dedup.shingleHashes(docs).count())
      t("minhashSignatures")(Dedup.minhashSignatures(docs).count())
      val sigs = Dedup.minhashSignatures(docs).persist()
      t("sigs persist+count")(sigs.count())
      t("lshCandidates (on cached)")(Dedup.lshCandidates(sigs).count())
      t("full minhashDedup")(Dedup.minhashDedup(docs, 0.8).count())
    }
    spark.stop()
  }
}
