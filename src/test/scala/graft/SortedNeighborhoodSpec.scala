package graft

import org.apache.spark.sql.functions._
import graft.ops.SortedNeighborhood

class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  // duplicate keys force the id tiebreak; 500 rows spread over many
  // input partitions so the offsets genuinely compose across ranges
  private val rows = (1L to 500L).map(i => (i, s"key${i % 97}"))

  test("distributed global rank == the sorted index, dense 0..n-1") {
    val ranked = SortedNeighborhood
      .globalRank(rows.toDF("id", "k").repartition(13), "id", "k")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val expected = rows.sortBy { case (id, k) => (k, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> i.toLong }.toMap
    assert(ranked == expected)
  }

  test("window pairs == brute-force neighborhood at w = 4") {
    val blocked = SortedNeighborhood
      .pairs(rows.toDF("id", "k").repartition(7), "id", "k", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sorted = rows.sortBy { case (id, k) => (k, id) }.map(_._1)
    val brute = (for {
      i <- sorted.indices; g <- 1 to 3 if i + g < sorted.length
    } yield (sorted(i), sorted(i + g), g.toLong)).toSet
    assert(blocked == brute && blocked.nonEmpty)
  }

  test("incremental rank-merge == batch pairs over the union (no global re-rank)") {
    // every 3rd row arrives as the batch — insertions land inside stored
    // neighborhoods (evicting stored pairs from the window), between
    // them, AND before the smallest stored key (the minPid fallback)
    // ids divisible by 3 so the before-all-keys rows land in the BATCH
    // and exercise the minPid routing fallback
    val all = rows :+ (9000L, "aaaaa") :+ (9003L, "aab")
    val df = all.toDF("id", "k")
    val existing = df.filter(col("id") % 3 =!= 0L)
    val incoming = df.filter(col("id") % 3 === 0L)
    val state = SortedNeighborhood.rankedState(
      existing.repartition(11), "id", "k")
    val stored = SortedNeighborhood.pairs(existing, "id", "k", 4)
    val inc = SortedNeighborhood
      .incrementalPairs(state, stored, incoming, "id", "k", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = SortedNeighborhood.pairs(df, "id", "k", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == batch, s"extra=${inc -- batch} missing=${batch -- inc}")
    // the merge really changed stored gaps: some stored pair is evicted
    val storedSet = stored.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(storedSet.exists { case (a, b) => !batch.exists(p =>
      p._1 == a && p._2 == b) })
  }

  test("multi-pass: a prefix-divergent near-miss is caught ONLY by pass 2") {
    // asmith_0099 / zsmith_0099 differ in char 1 — 30 filler names sort
    // BETWEEN them (pass-1 window can never bridge) — but their REVERSED
    // strings share the long suffix and sit adjacent in pass 2
    val fillers = (1L to 30L).map(i => (i, f"name$i%04d"))
    val all = fillers :+ (101L, "asmith_0099") :+ (102L, "zsmith_0099")
    val df = all.toDF("id", "name")
      .withColumn("rname", reverse(col("name")))
    val pass1 = SortedNeighborhood.pairs(df, "id", "name", 3)
      .select(least(col("id1"), col("id2")).as("a"),
        greatest(col("id1"), col("id2")).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pass1.contains((101L, 102L)), "pass 1 should miss the pair")
    val multi = SortedNeighborhood.pairsMultiKey(df, "id",
        Seq("name", "rname"), 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(multi.contains((101L, 102L)), "pass 2 must catch the pair")
    assert(multi((101L, 102L)) == 1L, "caught by exactly one pass")
    // and a same-prefix adjacent pair is proposed by pass 1 too
    assert(multi.exists(_._2 == 2L) || multi.size > 1)
  }

  test("incremental merge: cold start (empty state) == batch pairs over the batch") {
    val df = rows.toDF("id", "k")
    val state = SortedNeighborhood.rankedState(df.limit(0), "id", "k")
    val stored = SortedNeighborhood.pairs(df, "id", "k", 4).limit(0)
    val inc = SortedNeighborhood.incrementalPairs(state, stored, df, "id", "k", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = SortedNeighborhood.pairs(df, "id", "k", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == batch && inc.nonEmpty)
  }

  test("stored pid-partitioned state: append batch reads a sliver of the corpus") {
    val all = (1L to 4000L).map(i => (i, f"key$i%06d"))
    val df = all.toDF("id", "k")
    val existing = df.filter(col("id") <= 3600L)
    val incoming = df.filter(col("id") > 3600L) // keys sort past the corpus
    val dir = java.nio.file.Files.createTempDirectory("graft-sn-store")
      .toString + "/state"
    SortedNeighborhood.writeRankedState(existing.repartition(8), "id", "k", dir)
    // the boundary directory is ≤ #partitions rows — the full-state
    // aggregate never runs on the store path
    assert(spark.read.parquet(dir + SortedNeighborhood.BoundsSuffix).count() <= 32L)
    // the layout turns a pid filter into directory-level pruning
    val prunedScan = spark.read.parquet(dir).filter(col("pid").isin(0))
    assert(graft.ops.Bucketing.partitionFilters(prunedScan).contains("pid"),
      prunedScan.queryExecution.executedPlan.toString)
    val stored = SortedNeighborhood.pairs(existing, "id", "k", 4)
      .localCheckpoint(eager = true)
    // meter what the fold actually READS FROM DISK (task inputMetrics
    // also count cached-block reads, so they cannot isolate file I/O):
    // an append batch touches the last range partition only, so the fold
    // must read a sliver of the state directory — the unpruned plan
    // reads it 2-3 times over (merged-untouched scan + affected probe)
    import scala.jdk.CollectionConverters._
    def fsBytesRead(): Long = org.apache.hadoop.fs.FileSystem
      .getAllStatistics.asScala.map(_.getBytesRead).sum
    def dirBytes(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size).sum
    }
    val stateBytes = dirBytes(dir)
    val before = fsBytesRead()
    val inc = SortedNeighborhood
      .incrementalPairsFromStore(spark, dir, stored, incoming, "id", "k", 4)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val readBytes = fsBytesRead() - before
    val batch = SortedNeighborhood.pairs(df, "id", "k", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == batch, s"extra=${inc -- batch} missing=${batch -- inc}")
    assert(readBytes < stateBytes,
      s"fold read $readBytes B of a $stateBytes B state — pruning failed")
  }

  test("local-rank store: fold writes touched partitions, not the corpus") {
    // the bounded-WRITE twin of the read-sliver test above (r15 verdict
    // item 1): a clustered append to a local-rank store must rewrite the
    // touched pid partitions + relevant pair partitions + the tiny
    // bounds snapshot — never a corpus-sized state/pair snapshot
    import graft.ops.SortedNeighborhood
    import scala.jdk.CollectionConverters._
    val all = (1L to 4000L).map(i => (i, f"key$i%06d"))
    val df = all.toDF("id", "k")
    val existing = df.filter(col("id") <= 3960L)
    val incoming = df.filter(col("id") > 3960L) // keys sort past the corpus
    val dir = java.nio.file.Files.createTempDirectory("graft-sn-lstore")
    val st = dir.resolve("state").toString
    val pr = dir.resolve("pairs").toString
    SortedNeighborhood.ingestLocalStore(spark, st, pr, existing, "id", "k", 4, 0L)
    def dirBytes(p: String): Long =
      java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size).sum
    val storeBytes = dirBytes(st) + dirBytes(pr)
    def fsBytesWritten(): Long = org.apache.hadoop.fs.FileSystem
      .getAllStatistics.asScala.map(_.getBytesWritten).sum
    val before = fsBytesWritten()
    SortedNeighborhood.ingestLocalStore(spark, st, pr, incoming, "id", "k", 4, 1L)
    val written = fsBytesWritten() - before
    // 4 pids in this session: the append touches the last pid's state
    // (≈ S/4) and the last two pair partitions (≈ P/2) — anything past
    // (S+P)/2 + slack means a corpus-sized write crept back in
    assert(written < storeBytes / 2 + 4096,
      s"append fold wrote $written B against a $storeBytes B store")
    // and the folded store equals the one-shot run
    val pairs = SortedNeighborhood.readLocalPairs(spark, pr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = SortedNeighborhood.pairs(df, "id", "k", 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == batch, s"extra=${pairs -- batch} missing=${batch -- pairs}")
    val ranks = SortedNeighborhood.readLocalState(spark, st)
      .select("id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = all.sortBy { case (id, k) => (k, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> i.toLong }.toMap
    assert(ranks == expected)
  }

  test("local-rank store: scattered fold still exact (every pid touched)") {
    // the honest-floor regime: insertions land in EVERY pid — all
    // partitions rewrite (rank-shift semantics), but the result must
    // still equal the one-shot run, including stored-pair evictions
    import graft.ops.SortedNeighborhood
    val all = rows :+ (9000L, "aaaaa") :+ (9003L, "aab")
    val df = all.toDF("id", "k")
    val existing = df.filter(col("id") % 3 =!= 0L)
    val incoming = df.filter(col("id") % 3 === 0L)
    val dir = java.nio.file.Files.createTempDirectory("graft-sn-lscat")
    val st = dir.resolve("state").toString
    val pr = dir.resolve("pairs").toString
    SortedNeighborhood.ingestLocalStore(spark, st, pr,
      existing.repartition(11), "id", "k", 4, 0L)
    SortedNeighborhood.ingestLocalStore(spark, st, pr, incoming, "id", "k", 4, 1L)
    val pairs = SortedNeighborhood.readLocalPairs(spark, pr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = SortedNeighborhood.pairs(df, "id", "k", 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == batch, s"extra=${pairs -- batch} missing=${batch -- pairs}")
  }

  test("incremental merge is type-generic: LONG sort key, same contract") {
    // the boundary directory reads (sk, id) generically (r14 ADVICE) —
    // a numeric blocking key must route identically to a string one
    val all = (1L to 300L).map(i => (i, i % 37))
    val df = all.toDF("id", "k")
    val existing = df.filter(col("id") % 3 =!= 0L)
    val incoming = df.filter(col("id") % 3 === 0L)
    val state = SortedNeighborhood.rankedState(existing.repartition(7), "id", "k")
    val stored = SortedNeighborhood.pairs(existing, "id", "k", 4)
    val inc = SortedNeighborhood
      .incrementalPairs(state, stored, incoming, "id", "k", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = SortedNeighborhood.pairs(df, "id", "k", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == batch, s"extra=${inc -- batch} missing=${batch -- inc}")
  }
}
