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
  * Graph queries derive edges by MODULO cuts of lineitem, so inflation of
  * the PARQUET tables densifies their graphs instead of growing them (a
  * fixed modulus maps every replica into the same vertex space). Their
  * scale curve is measured instead by the `--graphs` mode below, which
  * replicates the DERIVED edge relations as K disjoint vertex-id-shifted
  * copies (same degree distribution, K times the vertices — sparsity
  * preserved) and times the graph algorithms on 1x vs Kx directly.
  */
object Inflate {

  /** K disjoint copies of an (src, dst) edge relation: every vertex id
    * shifts by replica*(maxId+1), so each copy carries the original's
    * exact degree distribution and component structure — "more graph",
    * never "denser graph". The honest scale model for vertex-grouped
    * algorithms (inflating a modulo-derived graph instead superimposes
    * replicas and measures saturation). */
  def replicateGraph(edges: DataFrame, k: Int): (DataFrame, Long) = {
    val base = edges.agg(greatest(max(col("src")), max(col("dst"))))
      .first().getLong(0) + 1L
    val rep = (0 until k).map { i =>
      edges.select((col("src") + lit(i * base)).as("src"),
        (col("dst") + lit(i * base)).as("dst"))
    }.reduce(_ unionByName _)
    (rep, base)
  }

  /** Skewed K-copy replication: [[replicateGraph]]'s disjoint copies with
    * a deterministic 1-in-`hubEvery` slice of every copy's edges rewired
    * to ONE fresh global hub vertex. The hub's degree grows with K·|E| —
    * a key whose frequency grows with data volume, the #1 100 TB plan
    * killer — while the rest of each copy keeps the original degree
    * structure. Severity knob: smaller `hubEvery` = hotter hub. */
  def replicateGraphSkewed(edges: DataFrame, k: Int,
      hubEvery: Long): (DataFrame, Long) = {
    val (rep, base) = replicateGraph(edges, k)
    val hub = k * base // a fresh id no replica uses
    val skewed = rep.select(col("src"),
        // select the rewired slice on ORIGINAL ids so every copy
        // contributes the same edge-shape to the hub
        when((col("src") % base * 31L + col("dst") % base) % hubEvery === 0,
          lit(hub)).otherwise(col("dst")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    (skewed, base)
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--graphs")) { GraphScale.run(args.drop(1)); return }
    if (args.headOption.contains("--skew")) { SkewScale.run(args.drop(1)); return }
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$inDir/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$t.parquet")

    // explicit per-column shift bases; FK-linked fact tables must share
    // one base per logical key (orderkey below), or replica alignment
    // silently relies on max(l_orderkey) == max(o_orderkey) — true for
    // TPC-H-shaped data (every order has lineitems) but a join-selectivity
    // skew for any input where it is not
    def replicate(df: DataFrame, bases: Map[String, Long]): DataFrame =
      (0 until k).map { i =>
        bases.foldLeft(df) { case (d, (c, b)) => d.withColumn(c, col(c) + lit(i * b)) }
      }.reduce(_ unionByName _)
    def maxOf(df: DataFrame, c: String): Long = df.agg(max(col(c))).first().getLong(0)

    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      write(read(t), t)
    }
    val (li, ord) = (read("lineitem"), read("orders"))
    val orderBase = math.max(maxOf(li, "l_orderkey"), maxOf(ord, "o_orderkey")) + 1L
    write(replicate(li, Map("l_orderkey" -> orderBase)), "lineitem")
    write(replicate(ord, Map("o_orderkey" -> orderBase)), "orders")
    val ev = read("events")
    write(replicate(ev, Map("event_id" -> (maxOf(ev, "event_id") + 1L),
      "user_id" -> (maxOf(ev, "user_id") + 1L))), "events")
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

/** The graph half of the scale sweep (`Inflate --graphs [sfDir] [k]`):
  * times each graph algorithm on its bench-derived edge relation and on
  * [[Inflate.replicateGraph]]'s K disjoint copies, printing per-algorithm
  * ratios for BASELINE.md's measured 10x table. A disjoint K-copy graph is
  * K independent instances of the same workload, so the ideal distributed
  * ratio is ~K/parallel-headroom for flat algorithms and ~K·rounds-parity
  * for iterative ones; any super-linear ratio is a plan defect, not an
  * inflation artifact (degree distribution is preserved exactly).
  *
  * SSSP is seeded with one source PER REPLICA (the same vertex, shifted):
  * a single source reaches only copy 0 of a disjoint graph and would
  * measure 1/K of the workload — the multi-seed frontier is the honest
  * K-times-the-work formulation. */
object GraphScale {
  def run(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 10
    // optional 3rd arg: comma-separated algorithm names — a 30x ktruss run
    // should not pay for re-measuring the whole suite
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet
      else Set.empty
    def want(name: String): Boolean = only.isEmpty || only.contains(name)
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    import graft.graph._

    // the same derived relations the bench queries use (GraphQueries.scala
    // constants: Mod=300 core graph, maxId-200 triangle cut, Mod-20000
    // sparse k-truss cut)
    val core = Graphs.lineitemEdges(spark, sfDir, 300).localCheckpoint(eager = true)
    val triCut = core.filter(col("src") <= 200 && col("dst") <= 200)
      .localCheckpoint(eager = true)
    val sparse = graft.core.Tables.lineitem(spark, sfDir).select(
        (col("l_orderkey") % 20000).cast("long").as("src"),
        (col("l_partkey") % 20000).cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(eager = true)

    def time2(label: String)(f: => DataFrame): Double = {
      def once: Double = {
        // release only state the run itself pinned: the shared edge
        // relations are localCheckpoint'd (lineage truncated) and must
        // survive across timings — a blanket unpersist kills them
        val keep = spark.sparkContext.getPersistentRDDs.keySet
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.foreach { case (id, r) =>
          if (!keep.contains(id)) r.unpersist(blocking = false)
        }
        dt
      }
      math.min(once, once) // repeat-min, same basis as Bench
    }
    def report(name: String, t1: Double, tk: Double): Unit =
      println(f"[graphscale] $name%-18s 1x=$t1%.2fs ${k}x=$tk%.2fs ratio=${tk / t1}%.1fx")

    // Materialized on first use, but ALWAYS dereferenced outside time2's
    // timed closure (the `val _ = core10C` lines below): time2's cleanup
    // unpersists every RDD not pinned before the timing, so a checkpoint
    // first materialized INSIDE a sample loses its blocks before sample 2
    // (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND).
    lazy val (core10, coreBase) = Inflate.replicateGraph(core, k)
    lazy val core10C = core10.localCheckpoint(eager = true)
    def needsCore10: Boolean = Seq("cc", "pagerank_damped", "pagerank_grown",
      "sssp_bfs", "cc_inc_fold", "sssp_w_inc_fold",
      "mis", "matching", "scc", "walks", "walks_biased",
      "coreness", "coreness_window", "densest").exists(want)
    if (needsCore10) core10C.count() // pin the checkpoint before any timing

    if (want("cc")) report("cc",
      time2("cc")(Graphs.connectedComponents(core)),
      time2("cc10")(Graphs.connectedComponents(core10C)))
    if (want("pagerank_damped")) report("pagerank_damped",
      time2("pr")(PageRank.runDamped(core, 10)),
      time2("pr10")(PageRank.runDamped(core10C, 10)))
    // the grown-graph warm start, both stages priced (the bench contract):
    // 4 rounds on the (src+dst)%5<>0 cut, then 6 full-graph rounds from
    // those ranks
    if (want("pagerank_grown")) {
      def grown(e: DataFrame): DataFrame = {
        val snap = PageRank.runDamped(
          e.filter((col("src") + col("dst")) % 5 =!= 0), 4).localCheckpoint(eager = true)
        PageRank.runDampedFrom(snap, e, 6)
      }
      report("pagerank_grown",
        time2("prg")(grown(core)),
        time2("prg10")(grown(core10C)))
    }
    // symmetry-breaking primitives: disjoint copies keep each replica's
    // degree structure, and the id-dependent hash priorities give every
    // copy its own (equally valid) peel — rounds = max over copies, so
    // the ideal curve is near-flat (round count dominates, work per
    // round is K-parallel)
    if (want("mis")) report("mis",
      time2("mis")(Graphs.maximalIndependentSet(core)),
      time2("mis10")(Graphs.maximalIndependentSet(core10C)))
    if (want("matching")) report("matching",
      time2("mm")(Graphs.maximalMatching(core)),
      time2("mm10")(Graphs.maximalMatching(core10C)))
    if (want("scc")) report("scc",
      time2("scc")(Graphs.stronglyConnectedComponents(core)),
      time2("scc10")(Graphs.stronglyConnectedComponents(core10C)))
    // walk corpus generation: K disjoint copies seed K× walks over K×
    // vertices — per-step frontier joins are K-parallel, rounds fixed at
    // the walk length, so the ideal curve is near-flat like mis/matching
    if (want("walks")) {
      def wk(e: DataFrame): DataFrame = {
        val seeds = Graphs.vertices(e).filter(col("vertex") % 3 === 0)
        Graphs.walkCooccurrence(Graphs.deterministicWalks(e, seeds, 4), 2)
      }
      report("walks", time2("walks")(wk(core)), time2("walks10")(wk(core10C)))
    }
    if (want("walks_biased")) {
      def wkb(e: DataFrame): DataFrame = {
        val seeds = Graphs.vertices(e).filter(col("vertex") % 3 === 0)
        Graphs.biasedWalks(e, seeds, 4, 1L, 4L, 2L)
      }
      report("walks_biased",
        time2("wb")(wkb(core)), time2("wb10")(wkb(core10C)))
    }
    // coreness: disjoint copies each converge to their own onion — rounds
    // = max over copies (same as 1x), per-round work K-parallel
    if (want("coreness")) report("coreness",
      time2("coreness")(Graphs.coreness(core)),
      time2("coreness10")(Graphs.coreness(core10C)))
    if (want("coreness_window")) report("coreness_window",
      time2("coreness_window")(Graphs.corenessWindow(core)),
      time2("coreness_window10")(Graphs.corenessWindow(core10C)))
    // densest subgraph: each copy carries the same density profile, so
    // the peel thresholds are copy-invariant and rounds match 1x
    if (want("densest")) report("densest",
      time2("densest")(Graphs.densestSubgraph(core)),
      time2("densest10")(Graphs.densestSubgraph(core10C)))
    if (want("sssp_bfs")) report("sssp_bfs",
      time2("sssp")(ShortestPath.multiSourceBfs(core, Seq(1L))),
      time2("sssp10")(ShortestPath.multiSourceBfs(core10C,
        (0 until k).map(i => 1L + i * coreBase))))
    if (want("triangles")) {
      val (tri10, _) = Inflate.replicateGraph(triCut, k)
      val tri10C = tri10.localCheckpoint(eager = true)
      report("triangles",
        time2("tri")(Triangles.countShuffle(triCut, maxId = Long.MaxValue)),
        time2("tri10")(Triangles.countShuffle(tri10C, maxId = Long.MaxValue)))
    }
    // common-neighbor link prediction on the bench's sparse CnMod cut; the
    // id cap is applied BEFORE replication (replica ids exceed it by
    // construction), so each copy carries exactly the 1x workload
    if (want("commonneighbors")) {
      val cnCut = Graphs.lineitemEdges(spark, sfDir, 50000)
        .filter(col("src") <= 25000 && col("dst") <= 25000)
        .localCheckpoint(eager = true)
      val (cnK, _) = Inflate.replicateGraph(cnCut, k)
      val cnKC = cnK.localCheckpoint(eager = true)
      report("commonneighbors",
        time2("cn")(Triangles.commonNeighbors(cnCut, maxId = Long.MaxValue, k = 100)),
        time2("cn10")(Triangles.commonNeighbors(cnKC, maxId = Long.MaxValue, k = 100)))
    }
    // the sweep EXISTS to price the wedge growth, so it opts out of the
    // density guard (10 disjoint copies = 10x the 1x wedge count, which
    // crosses the fixed default budget by design, not by densification)
    if (want("ktruss_sparse")) {
      val (sparse10, _) = Inflate.replicateGraph(sparse, k)
      val sparse10C = sparse10.localCheckpoint(eager = true)
      report("ktruss_sparse",
        time2("kt")(Graphs.kTruss(sparse, 3, maxWedges = Long.MaxValue)),
        time2("kt10")(Graphs.kTruss(sparse10C, 3, maxWedges = Long.MaxValue)))
    }

    // incremental algorithms, steady-state slice: the stored state (labels
    // / distances over the 80% cut) is MATERIALIZED outside the clock —
    // only the fold of the 20% batch is timed, pricing exactly what a
    // production ingest pays. The batch split replicates per-copy, so the
    // Kx fold sees K times the touched region.
    def cut(e: DataFrame, keep: Boolean): DataFrame =
      e.filter(((col("src") + col("dst")) % 5 =!= 0) === keep)
    if (want("cc_inc_fold")) {
      val cc1Stored = Graphs.connectedComponents(cut(core, true))
        .localCheckpoint(eager = true)
      val cc10Stored = Graphs.connectedComponents(cut(core10C, true))
        .localCheckpoint(eager = true)
      report("cc_inc_fold",
        time2("cci")(Graphs.incrementalComponents(cc1Stored, cut(core, false))),
        time2("cci10")(Graphs.incrementalComponents(cc10Stored, cut(core10C, false))))
    }
    if (want("sssp_w_inc_fold")) {
      def weighted(e: DataFrame): DataFrame = e
        .withColumn("w", lit(1.0) + (col("src") + col("dst")) % 5)
      val w1 = weighted(core).localCheckpoint(eager = true)
      val w10 = weighted(core10C).localCheckpoint(eager = true)
      val sw1Stored = ShortestPath.runWeighted(cut(w1, true), 1L, 50)
        .localCheckpoint(eager = true)
      // multi-seed twin of the sssp_bfs sweep: one source per replica, else
      // the fold reaches only copy 0 and measures 1/K of the work — seeds
      // ride as zero-distance rows in the stored relation
      val sw10Seeds = (0 until k).map(i => 1L + i * coreBase)
      val sw10Stored = sw10Seeds.map(s => ShortestPath.runWeighted(cut(w10, true), s, 50)
          .filter(col("dist") =!= Double.PositiveInfinity))
        .reduce(_ unionByName _)
        .groupBy("vertex").agg(min("dist").as("dist"))
        .localCheckpoint(eager = true)
      report("sssp_w_inc_fold",
        time2("swi")(ShortestPath.incrementalWeighted(sw1Stored, cut(w1, false), w1, 50)),
        time2("swi10")(ShortestPath.incrementalWeighted(sw10Stored, cut(w10, false), w10, 50)))
    }
    spark.stop()
  }
}

/** The skew half of the scale sweep (`Inflate --skew [sfDir] [k] [hubEvery]
  * [hotEvery] [algos]`): every uniform sweep replicates DISJOINT copies, so
  * the engine's skew defenses (degree-ordered orientation, postings caps,
  * salted aggregation, AQE skew join) were plan-argued but never
  * sweep-measured — and a key whose frequency grows with data volume is the
  * way 100 TB plans actually die. Two deliberate skew injections:
  *
  *  - GRAPH: [[Inflate.replicateGraphSkewed]] rewires 1-in-`hubEvery` edges
  *    of every copy to one global hub. With the hub the max-degree vertex,
  *    [[graft.graph.Graphs.orientByDegree]] points every hub edge INTO the
  *    hub, so π-oriented wedges through it are in(hub)·out(hub) = 0 — the
  *    defense under test for triangles/k-truss. Matching/MIS see the hub as
  *    one vertex whose edge slice drops once it decides.
  *
  *  - TEXT: 1-in-`hotEvery` documents become 60-word shared-boilerplate
  *    templates (plus a per-doc unique tail), pairwise Jaccard ~0.5 — LSH's
  *    worst spot: band collisions flood the candidate stage (~23% of hot
  *    pairs at 4x4 banding) but exact-Jaccard verification rejects them
  *    all, pure wasted work. The hot-gram postings cap is the substring
  *    path's defense (boilerplate grams blow past maxOcc and leave the
  *    anchor set, a documented recall boundary).
  *
  *  - EVENTS (round 11): 1-in-`hotEvery` events of the K-replicated log
  *    collapse onto ONE user — the bot-traffic shape — and the sweep times
  *    the actual catalog per-user-window queries (sessionize/asof/funnel/
  *    retention) over temp parquet dirs, so the measured plan is the
  *    certified plan. Severity knob: hotEvery=4 puts 25% of all events on
  *    one user.
  *
  * Reports 10x-uniform vs 10x-skewed; the honest penalty metric is
  * skew/uniform at the SAME volume (a fixed-work denominator would conflate
  * skew with scale). */
object SkewScale {
  def run(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 10
    val hubEvery = if (args.length > 2) args(2).toLong else 20L
    val hotEvery = if (args.length > 3) args(3).toLong else 50L
    val only: Set[String] =
      if (args.length > 4) args(4).split(",").map(_.trim).filter(_.nonEmpty).toSet
      else Set.empty
    def want(name: String): Boolean = only.isEmpty || only.contains(name)
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    import graft.graph._

    def time2(f: => DataFrame): Double = {
      def once: Double = {
        val keep = spark.sparkContext.getPersistentRDDs.keySet
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.foreach { case (id, r) =>
          if (!keep.contains(id)) r.unpersist(blocking = false)
        }
        dt
      }
      math.min(once, once)
    }
    def report(name: String, tu: Double, ts: Double): Unit =
      println(f"[skewscale] $name%-18s ${k}x-uniform=$tu%.2fs ${k}x-skew=$ts%.2fs penalty=${ts / tu}%.2fx")
    // honest denominators: hub rewiring collapses some edges under
    // distinct, so the skewed graph is slightly smaller — print both
    // sizes (and the hub's degree) next to every graph penalty
    def reportEdges(name: String, u: DataFrame, sk: DataFrame): Unit = {
      val hubDeg = sk.groupBy("dst").agg(count(lit(1)).as("d"))
        .orderBy(col("d").desc).first()
      println(f"[skewscale] $name%-18s edges: uniform=${u.count()} skew=${sk.count()} " +
        s"hub_degree=${hubDeg.getLong(1)}")
    }

    // ---- graph side: one global hub spanning the copies
    val core = Graphs.lineitemEdges(spark, sfDir, 300).localCheckpoint(eager = true)
    lazy val coreU = Inflate.replicateGraph(core, k)._1.localCheckpoint(eager = true)
    lazy val coreS = Inflate.replicateGraphSkewed(core, k, hubEvery)._1
      .localCheckpoint(eager = true)
    if (Seq("matching", "mis", "walks", "coreness",
        "coreness_window").exists(want)) {
      coreU.count(); coreS.count()
    }

    if (want("triangles")) {
      val triCut = core.filter(col("src") <= 200 && col("dst") <= 200)
        .localCheckpoint(eager = true)
      val triU = Inflate.replicateGraph(triCut, k)._1.localCheckpoint(eager = true)
      val triS = Inflate.replicateGraphSkewed(triCut, k, hubEvery)._1
        .localCheckpoint(eager = true)
      reportEdges("triangles", triU, triS)
      report("triangles",
        time2(Triangles.countShuffle(triU, maxId = Long.MaxValue)),
        time2(Triangles.countShuffle(triS, maxId = Long.MaxValue)))
    }
    if (want("ktruss_sparse")) {
      val sparse = graft.core.Tables.lineitem(spark, sfDir).select(
          (col("l_orderkey") % 20000).cast("long").as("src"),
          (col("l_partkey") % 20000).cast("long").as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
        .localCheckpoint(eager = true)
      val ktU = Inflate.replicateGraph(sparse, k)._1.localCheckpoint(eager = true)
      val ktS = Inflate.replicateGraphSkewed(sparse, k, hubEvery)._1
        .localCheckpoint(eager = true)
      reportEdges("ktruss_sparse", ktU, ktS)
      report("ktruss_sparse",
        time2(Graphs.kTruss(ktU, 3, maxWedges = Long.MaxValue)),
        time2(Graphs.kTruss(ktS, 3, maxWedges = Long.MaxValue)))
    }
    if (Seq("matching", "mis", "walks", "coreness", "coreness_window").exists(want))
      reportEdges("core", coreU, coreS)
    // walk corpus under the global hub: many walks route THROUGH the hub
    // each step — the min-agg's map-side partials are the claimed defense
    if (want("walks")) {
      def wk(e: DataFrame): DataFrame = {
        val seeds = Graphs.vertices(e).filter(col("vertex") % 3 === 0)
        Graphs.walkCooccurrence(Graphs.deterministicWalks(e, seeds, 4), 2)
      }
      report("walks", time2(wk(coreU)), time2(wk(coreS)))
    }
    // the rank-window twin under the hub: the per-round h-index window
    // sorts the hub's whole degree on one task — the documented hazard,
    // priced (round 13 demoted it to Graphs.corenessWindow)
    if (want("coreness_window")) report("coreness_window",
      time2(Graphs.corenessWindow(coreU)), time2(Graphs.corenessWindow(coreS)))
    // the bucketed DEFAULT under the SAME hub: the defense, priced — the
    // histogram shuffle + histogram-sized window must stay ~flat where
    // the rank window pays the hub's degree on one task
    if (want("coreness")) report("coreness",
      time2(Graphs.coreness(coreU)), time2(Graphs.coreness(coreS)))
    if (want("matching")) report("matching",
      time2(Graphs.maximalMatching(coreU)),
      time2(Graphs.maximalMatching(coreS)))
    if (want("mis")) report("mis",
      time2(Graphs.maximalIndependentSet(coreU)),
      time2(Graphs.maximalIndependentSet(coreS)))

    // ---- relational side: one hot join/group key whose row count grows
    // with K — the classic warehouse skew (a null-ish default key, a
    // bot user, a catch-all order). Defenses under test: AQE skew-join
    // split (spark.sql.adaptive.* defaults, Spark 3.2+) for the shuffle
    // join, map-side partial aggregation for the groupBy.
    if (Seq("join", "groupby").exists(want)) {
      def liRep(skew: Boolean): DataFrame = {
        val li = graft.core.Tables.lineitem(spark, sfDir)
          .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
        val base = li.agg(max(col("l_orderkey"))).first().getLong(0) + 1L
        val rep = (0 until k).map(i =>
          li.withColumn("l_orderkey", col("l_orderkey") + lit(i * base)))
          .reduce(_ unionByName _)
        if (!skew) rep
        // 1-in-hubEvery lines (same slice per copy) collapse onto ONE
        // order key: its row count grows with K·|lineitem|/hubEvery
        else rep.withColumn("l_orderkey",
          when(col("l_partkey") % hubEvery === 0, lit(0L))
            .otherwise(col("l_orderkey")))
      }
      def ordRep: DataFrame = {
        val ord = graft.core.Tables.orders(spark, sfDir)
          .select("o_orderkey", "o_custkey", "o_orderdate")
        val base = ord.agg(max(col("o_orderkey"))).first().getLong(0) + 1L
        (0 until k).map(i =>
          ord.withColumn("o_orderkey", col("o_orderkey") + lit(i * base)))
          .reduce(_ unionByName _)
          // the hot key needs a match or the skewed probe rows die at
          // the join instead of exercising the skewed build
          .unionByName(spark.range(1).select(lit(0L).as("o_orderkey"),
            lit(1L).as("o_custkey"), expr("DATE '1995-01-01'").as("o_orderdate")))
      }
      // strict vals: an eager checkpoint must materialize OUTSIDE the
      // timed closure, or time2's cleanup unpersists it between samples
      // (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — the GraphScale dereference
      // rule)
      val liU = liRep(skew = false).localCheckpoint(eager = true)
      val liS = liRep(skew = true).localCheckpoint(eager = true)
      if (want("join")) {
        val ords = ordRep.localCheckpoint(eager = true)
        def q(li: DataFrame): DataFrame = li
          .join(ords, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
        report("join", time2(q(liU)), time2(q(liS)))
      }
      if (want("groupby")) {
        def q(li: DataFrame): DataFrame = li.groupBy("l_orderkey")
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"))
        report("groupby", time2(q(liU)), time2(q(liS)))
      }
    }

    // ---- edit-join side: K× customers with REGENERATED serial names
    // (disjoint ranges — the realistic growth shape; buckets stay at the
    // structural (L+1)·|Σ| bound). The skew twin collapses 1-in-hotEvery
    // customers onto ONE shared name: every collapsed pair is a REAL
    // distance-0 pair, so the true output is quadratic in the duplicate
    // count — the winnow-family regime, priced honestly (exact dedup
    // first is the pipeline's documented answer, not a cap).
    if (Seq("editjoin", "editjoin_grouped", "sorted_block",
        "editjoin2").exists(want)) {
      val cust = graft.core.Tables.customer(spark, sfDir)
        .select("c_custkey")
      val cbase = cust.agg(max(col("c_custkey"))).first().getLong(0) + 1L
      def crep(hot: Boolean): DataFrame = {
        val rep = (0 until k).map(i =>
          cust.withColumn("c_custkey", col("c_custkey") + lit(i * cbase)))
          .reduce(_ unionByName _)
        val named = rep.withColumn("c_name",
          format_string("Customer#%09d", col("c_custkey")))
        if (!hot) named
        else named.withColumn("c_name",
          when(col("c_custkey") % hotEvery === 0, lit("Customer#000000000"))
            .otherwise(col("c_name")))
      }
      val cU = crep(hot = false).localCheckpoint(eager = true)
      val cS = crep(hot = true).localCheckpoint(eager = true)
      def ej(df: DataFrame): DataFrame =
        graft.ops.EditJoin.pairsWithin1(df, "c_custkey", "c_name")
      if (want("editjoin"))
        report("editjoin", time2(ej(cU)), time2(ej(cS)))
      // the grouped twin under the SAME duplicate identity: one group
      // row carries the C(n,2) mass the exploded form must write out
      if (want("editjoin_grouped")) {
        def ejg(df: DataFrame): DataFrame =
          graft.ops.EditJoin.pairsWithin1Grouped(df, "c_custkey", "c_name")
        report("editjoin_grouped", time2(ejg(cU)), time2(ejg(cS)))
      }
      // sorted-neighborhood under the same duplicate identity: the tie
      // block lands in one range partition but the per-row work stays
      // linear (row_number, then w-1 banded successors) — the window
      // method's structural insensitivity to value skew, priced
      if (want("sorted_block")) {
        def snb(df: DataFrame): DataFrame =
          graft.ops.SortedNeighborhood.pairs(df, "c_custkey", "c_name", 5)
        report("sorted_block", time2(snb(cU)), time2(snb(cS)))
      }
      // k=2 blocking at scale: SPARSE serials (×37) keep true distance-2
      // pairs rare, so the row prices the blocking machinery (the L²/2
      // variant fan-out, the bucket join, the verify) rather than a
      // dense-lattice quadratic OUTPUT — the dense regime is the catalog
      // face's job (capped serial prefix) and the duplicate regime is the
      // grouped twin's. The skew twin collapses 1-in-hotEvery names, so
      // run it with hotEvery ≥ ~200 to keep the true C(n,2) mass bounded.
      if (want("editjoin2")) {
        def sparse(df: DataFrame): DataFrame = df.withColumn("c_name",
          when(col("c_name") === "Customer#000000000", col("c_name"))
            .otherwise(format_string("Customer#%09d", col("c_custkey") * 37)))
        def ej2(df: DataFrame): DataFrame =
          graft.ops.EditJoin.pairsWithin2(sparse(df), "c_custkey", "c_name",
            maxCandidates = Long.MaxValue) // the sweep prices, never refuses
        report("editjoin2", time2(ej2(cU)), time2(ej2(cS)))
      }
    }

    // ---- text side: shared boilerplate = hot shingles / grams / bands
    def docReplicas(hot: Boolean): DataFrame = {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
      val base = docs.agg(max(col("doc_id"))).first().getLong(0) + 1L
      val boiler = (0 until 60).map(i => s"bp$i").mkString(" ")
      val rep = (0 until k).map { i =>
        val d = docs.withColumn("doc_id", col("doc_id") + lit(i * base))
        if (i == 0) d
        else d.withColumn("text",
          expr(s"concat_ws(' ', transform(split(text, ' '), (w, j) -> " +
            s"CASE WHEN j % 3 = 2 THEN concat('r$i', 'x', j) ELSE w END))"))
      }.reduce(_ unionByName _)
      if (!hot) rep
      else rep.withColumn("text",
        // 1-in-hotEvery docs (same slice in every copy) become a shared
        // 60-word template + a 30-word per-doc unique tail: pairwise
        // Jaccard ~0.5 across ALL copies — the boilerplate regime
        when(col("doc_id") % lit(base) % lit(hotEvery) === 0,
          concat(lit(boiler), lit(" "),
            concat_ws(" ", slice(split(col("text"), " "), 1, 30))))
          .otherwise(col("text")))
    }
    // ---- events side: ONE hot user owning 1-in-hotEvery of ALL events —
    // the realistic bot-traffic shape (run with hotEvery=4 for the "one
    // user is 25% of the log" severity). The per-user-window queries
    // (sessionize, as-of, funnel, retention) move each row exactly once
    // through a per-user sort/agg, which is precisely where a hot key
    // hurts: the hot user's whole slice lands on ONE task's sort buffer.
    // The sweep times the ACTUAL catalog queries over temp dirs (uniform
    // Kx vs hot Kx), so the measured plan is the certified plan — all four
    // read only events.parquet. Timestamps are untouched: the hot user's
    // events span the full window, maximizing its per-partition sort.
    if (Seq("sessionize", "asof", "funnel", "retention",
        "sessionize_chunked", "asof_chunked", "latest", "latest_agg",
        "ewma", "holt", "cusum", "quantile", "cms", "bloom",
        "hll", "mg").exists(want)) {
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      val eidBase = ev.agg(max(col("event_id"))).first().getLong(0) + 1L
      val uidBase = ev.agg(max(col("user_id"))).first().getLong(0) + 1L
      val rep = (0 until k).map(i =>
        ev.withColumn("event_id", col("event_id") + lit(i * eidBase))
          .withColumn("user_id", col("user_id") + lit(i * uidBase)))
        .reduce(_ unionByName _)
      val uDir = "/tmp/graft_skew_events_u"
      val sDir = "/tmp/graft_skew_events_s"
      rep.write.mode(SaveMode.Overwrite).parquet(s"$uDir/events.parquet")
      rep.withColumn("user_id",
          // same deterministic 1-in-hotEvery slice in every copy; user 0
          // becomes the bot (its own rows stay, adding to the heat)
          when(col("event_id") % hotEvery === 0, lit(0L)).otherwise(col("user_id")))
        .write.mode(SaveMode.Overwrite).parquet(s"$sDir/events.parquet")
      def q(name: String, dir: String): DataFrame =
        graft.SparkEntry.queries(name)(spark, dir)
      Seq("sessionize" -> "q_events_sessionize", "asof" -> "q_asof_join",
        "funnel" -> "q_events_funnel", "retention" -> "q_events_retention",
        // the chunked twins under the SAME hot user: the defense, priced
        "sessionize_chunked" -> "q_events_sessionize_chunked",
        "asof_chunked" -> "q_asof_join_chunked",
        // latest-per-key: window formulation vs the agg twin whose
        // map-side partials absorb the hot key before the shuffle
        "latest" -> "q_events_latest", "latest_agg" -> "q_events_latest_agg",
        // EWMA's rn<=W filter triggers the rank-limit pushdown
        // (WindowGroupLimit below the exchange), so the hot user's slice
        // is pruned to W rows per input partition BEFORE it can pile
        // onto one task — the built-in defense, priced here
        "ewma" -> "q_time_ewma",
        // holt/cusum ride the same trailing-window rn<=W cut as ewma, so
        // the same rank-limit pushdown prunes the hot user's slice to W
        // rows per input partition before it can pile onto one task
        "holt" -> "q_time_holt", "cusum" -> "q_time_cusum")
        .foreach { case (m, qn) =>
          if (want(m)) report(m, time2(q(qn, uDir)), time2(q(qn, sDir)))
        }
      // per-USER quantile profile under the hot user: the sketch's
      // hot-key-safe-by-construction claim, priced — the shuffle carries
      // bucket histograms (map-side partials absorb the bot's rows
      // before the exchange), so one user owning 25% of the log must
      // cost ~nothing vs the uniform twin
      if (want("quantile")) {
        def qsk(dir: String): DataFrame = {
          val e = spark.read.parquet(s"$dir/events.parquet")
            .select(col("user_id"),
              expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))
          graft.ops.QuantileSketch.quantiles(
            graft.ops.QuantileSketch.sketch(e, Seq("user_id"), "v"),
            Seq("user_id"), Seq(50, 90, 99))
        }
        report("quantile", time2(qsk(uDir)), time2(qsk(sDir)))
      }
      // per-USER Count-Min frequency sketch under the hot user: the CMS
      // twin of the quantile claim — the shuffle carries ≤ Depth·Width
      // cells per group however many events the bot owns (map-side
      // partials fold raw rows into cells before the exchange), so the
      // hot user must cost ~nothing; skew SHRINKS the distinct-group
      // count, so it can even be cheaper (the quantile pattern)
      if (want("cms")) {
        def csk(dir: String): DataFrame = {
          val e = spark.read.parquet(s"$dir/events.parquet")
            .select(col("user_id"),
              expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("k"))
          graft.ops.CountMin.sketch(e, Seq("user_id"), "k")
        }
        report("cms", time2(csk(uDir)), time2(csk(sDir)))
      }
      // per-USER Bloom filter under the hot user: same fixed-size-state
      // argument via map-side partial DISTINCT (bits fold before the
      // exchange; ≤ Depth·min(Width, distinct values) bits per group)
      if (want("bloom")) {
        def bsk(dir: String): DataFrame = {
          val e = spark.read.parquet(s"$dir/events.parquet")
            .select(col("user_id"),
              expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("k"))
          graft.ops.BloomSketch.sketch(e, Seq("user_id"), "k")
        }
        report("bloom", time2(bsk(uDir)), time2(bsk(sDir)))
      }
      // per-USER HLL registers under the hot user — the fourth sketch
      // family's sweep row: ≤ 64 register ints per group via map-side
      // partial max, whatever the bot owns
      if (want("hll")) {
        def hsk(dir: String): DataFrame = {
          val e = spark.read.parquet(s"$dir/events.parquet")
            .select(col("user_id"),
              expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("k"))
          graft.ops.Hll.registers(e, Seq("user_id"), "k")
        }
        report("hll", time2(hsk(uDir)), time2(hsk(sDir)))
      }
      // per-USER Misra–Gries heavy-hitters summary under the hot user —
      // the FIFTH family member's sweep row: the build's exact batch
      // count folds map-side and the top-(K+1) extraction caps every
      // upstream partition at K+1 rows per group BEFORE the exchange
      // (TopKPerKey's partial pass), so the bot's mass is absorbed like
      // every other family member's
      if (want("mg")) {
        def msk(dir: String): DataFrame = {
          val e = spark.read.parquet(s"$dir/events.parquet")
            .select(col("user_id"),
              // the ramp key: counts rise linearly in k, so the top-K
              // cut is non-trivial at every scale
              expr("CAST(floor(sqrt(CAST(value AS DECIMAL(18,2)) * 100)) AS BIGINT)").as("k"))
          graft.ops.MisraGries.summary(e, Seq("user_id"), "k")
        }
        report("mg", time2(msk(uDir)), time2(msk(sDir)))
      }
    }

    if (Seq("minhash", "minhash_capped", "substring", "boilerplate",
        "novelty", "importance", "winnow", "winnow_capped").exists(want)) {
      val dU = docReplicas(hot = false).localCheckpoint(eager = true)
      val dS = docReplicas(hot = true).localCheckpoint(eager = true)
      if (want("minhash")) report("minhash",
        time2(graft.pipeline.Dedup.minhashDedup(dU, 0.8)),
        time2(graft.pipeline.Dedup.minhashDedup(dS, 0.8)))
      // the band-key postings cap (the fix the uncapped row motivates):
      // 256 >> any true near-dup family, << the boilerplate key occupancy
      if (want("minhash_capped")) report("minhash_capped",
        time2(graft.pipeline.Dedup.minhashDedup(dU, 0.8, maxBandOcc = 256L)),
        time2(graft.pipeline.Dedup.minhashDedup(dS, 0.8, maxBandOcc = 256L)))
      if (want("substring")) report("substring",
        time2(graft.pipeline.Dedup.substringSpans(dU, 8, 16, 64L)),
        time2(graft.pipeline.Dedup.substringSpans(dS, 8, 16, 64L)))
      // frequency-based boilerplate scrub UNDER the boilerplate regime:
      // the operator's claim is that a hot template makes it cheaper, not
      // slower (df-count partials collapse the hot gram; no pairwise
      // join exists to blow up) — while the pairwise path's cap DROPS
      // the template (recall boundary), this one removes it, priced here
      if (want("boilerplate")) report("boilerplate",
        time2(graft.pipeline.Dedup.boilerplateScrub(dU, 8, minDf = 5L)),
        time2(graft.pipeline.Dedup.boilerplateScrub(dS, 8, minDf = 5L)))
      // novelty under shared boilerplate: the min-carrier agg sees ONE
      // hot gram key per template position — map-side partials absorb it
      if (want("novelty")) report("novelty",
        time2(graft.pipeline.TextAnalysis.noveltyScores(dU, 4)),
        time2(graft.pipeline.TextAnalysis.noveltyScores(dS, 4)))
      // importance under shared boilerplate: each template gram becomes
      // ONE hot r_df key — count partials absorb it; the broadcast t_df
      // side is untouched and the raw side never goes pairwise
      if (want("importance")) {
        def imp(d: DataFrame): DataFrame =
          graft.pipeline.TextAnalysis.importanceScores(
            d.filter(col("doc_id") % 50 =!= 1),
            d.filter(col("doc_id") % 50 === 1), 2)
        report("importance", time2(imp(dU)), time2(imp(dS)))
      }
      // winnow under shared boilerplate: every template doc carries the
      // same ~30 selected prints, so the uncapped pair join goes quadratic
      // in the template count — the df cap is the defense, priced next row
      if (want("winnow")) report("winnow",
        time2(graft.pipeline.Dedup.winnowPairs(dU)),
        time2(graft.pipeline.Dedup.winnowPairs(dS)))
      if (want("winnow_capped")) report("winnow_capped",
        time2(graft.pipeline.Dedup.winnowPairs(dU, 3, 4, 4L, 256L)),
        time2(graft.pipeline.Dedup.winnowPairs(dS, 3, 4, 4L, 256L)))
    }
    spark.stop()
  }
}
