package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.apps._
import graft.core.IO

/** End-to-end tests of the reference-program equivalents over the F1 edge
  * fixture (FIXTURES.md): CSV in, CSV out, values hand-computed.
  */
class AppsSpec extends SparkSpec {

  // F1 fixture: triangle 1->2->3->1, a zero-follower vertex (5 only follows),
  // a dangling vertex (4: followed, no out-edges), a duplicate edge, and one
  // id above the RepJoin bound
  private lazy val edgeDir: String = {
    val dir = Files.createTempDirectory("graft-edges")
    Files.writeString(dir.resolve("edges.csv"),
      """1,2
        |2,3
        |3,1
        |1,3
        |5,1
        |5,1
        |2,4
        |1,2000
        |2000,3
        |not,a,number
        |""".stripMargin)
    dir.toString
  }

  test("CSV edge source: schema-on-read, malformed lines dropped") {
    val e = IO.readEdgesCsv(spark, edgeDir)
    assert(e.schema.fieldNames.toSeq == Seq("src", "dst"))
    assert(e.count() == 9) // 10 lines - 1 malformed
  }

  test("FollowersCountApp matches hand count and CSV round-trips") {
    val out = FollowersCountApp.run(spark, edgeDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // dst counts: 2<-1, 3<-(2,1,2000), 1<-(3,5,5), 4<-2, 2000<-1
    assert(out == Map(2L -> 1L, 3L -> 3L, 1L -> 3L, 4L -> 1L, 2000L -> 1L))

    val outDir = Files.createTempDirectory("graft-out").toString
    IO.writeCsv(FollowersCountApp.run(spark, edgeDir), outDir)
    val back = spark.read.schema("user LONG, followers LONG").csv(outDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(back == out)
  }

  test("TriangleCountApp: shuffle and broadcast variants agree; bound excludes 2000") {
    // duplicate edges are NOT deduped by the reference join either — with
    // bound 1000 only triangle 1->2->3->1 counts (duplicate 5,1 edges don't
    // form cycles); high-id path 1->2000->3 excluded by the max filter
    val s = TriangleCountApp.runShuffle(spark, edgeDir, maxId = 1000).first().getDouble(0)
    val b = TriangleCountApp.runBroadcast(spark, edgeDir, maxId = 1000).first().getDouble(0)
    assert(s == 1.0 && b == 1.0)
    // raising the bound admits the 1->2000->3->1 cycle
    val s2 = TriangleCountApp.runShuffle(spark, edgeDir, maxId = 100000).first().getDouble(0)
    assert(s2 == 2.0)
  }

  test("ShortestPathApp: distances and MR-style path string") {
    val d = ShortestPathApp.run(spark, edgeDir, source = 5L).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d(5L) == 0.0 && d(1L) == 1.0 && d(2L) == 2.0 && d(3L) == 2.0 && d(4L) == 3.0)
    val p = ShortestPathApp.runWithPath(spark, edgeDir, source = 5L).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(p(4L) == "5 1 2 4")
  }

  test("PageRankApp: both reference output modes; mass conserved") {
    val ranks = PageRankApp.run(spark, k = 5)
    val mass = ranks.agg(sum("rank")).first().getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-9)
    assert(PageRankApp.first100ByKey(ranks).count() == 25) // k^2 = 25 vertices
    assert(PageRankApp.top100ByRank(ranks).count() == 26)  // all vertices incl dummy
  }

  test("KMeansApp clusters follower counts") {
    val res = KMeansApp.run(spark, edgeDir, init = Seq(1.0, 3.0))
    // follower counts: [1,1,1,3,3] -> clusters {1,1,1} and {3,3}
    assert(res.centroids == Seq(1.0, 3.0))
    assert(res.sse.last == 0.0)
  }

  test("tuple-text sink emits reference byte format; debugString dumps a plan") {
    import spark.implicits._
    val df = Seq((42L, 7L), (1L, 2L)).toDF("k", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft-tuple").toString + "/out"
    graft.core.IO.writeTupleText(df, dir)
    val lines = spark.read.text(dir).collect().map(_.getString(0)).sorted
    assert(lines.sameElements(Array("(1,2)", "(42,7)"))) // Tuple2.toString parity
    assert(graft.core.IO.debugString(df).contains("LocalTableScan"))
  }

  test("JSONL round-trip preserves the documents table; malformed lines drop") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString + "/docs"
    graft.core.IO.writeJsonl(docs, dir)
    val back = graft.core.IO.readJsonl(spark, dir, docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)

    // declared schema + DROPMALFORMED: a garbage line must not poison the read
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "garbage.json"),
      "{not json at all\n".getBytes)
    assert(graft.core.IO.readJsonl(spark, dir, docs.schema)
      .na.drop(Seq("doc_id")).count() == docs.count())
  }

  test("CurateApp writes a curated corpus partitioned by predicted language") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-curate").toString + "/corpus"
    graft.pipeline.Corpus.writeCorpus(
      graft.apps.CurateApp.run(spark, docs), out, "lang_pred", 1000L)
    val back = spark.read.parquet(out)
    assert(back.count() > 0 && back.count() < docs.count())
    assert(back.columns.contains("text") && back.columns.contains("lang_pred"))
    // directory layout is the partition column
    assert(new java.io.File(out).listFiles().exists(_.getName.startsWith("lang_pred=")))
  }

  test("partitioned corpus read prunes to the filtered partition directories") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString + "/corpus"
    graft.pipeline.Corpus.writeCorpus(docs, out, "lang", 1000L)
    val back = spark.read.parquet(out)
    val q = back.filter(org.apache.spark.sql.functions.col("lang") === "en")
    // the partition predicate must become a PartitionFilter (directory
    // pruning — at 100 TB the non-matching partitions are never listed into
    // the scan), not a post-scan Filter over all partitions
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && "PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(p).isDefined, p)
    assert(q.count() == docs.filter(org.apache.spark.sql.functions.col("lang") === "en").count())
  }

  test("range-clustered write produces files with disjoint key ranges") {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    // normalized load: ts as canonical nanos BIGINT regardless of the
    // testdata's physical encoding (see Tables.normalizeEventTs)
    val events = graft.core.Tables.events(spark, sf("sf0.001"))
    val out = java.nio.file.Files.createTempDirectory("graft-cluster").toString + "/ev"
    graft.core.IO.writeRangeClustered(events, out, "ts", files = 4)
    val back = spark.read.parquet(out)
    assert(back.count() == events.count())
    // per-file min/max ranges must be pairwise disjoint — that is what the
    // parquet footer stats expose for file/row-group skipping on ts scans
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(min("ts").as("lo"), max("ts").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "expected multiple output files")
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, s"overlapping file ranges: $hi > $lo")
    }
    // and an ordinary range predicate still reaches the scan
    val p = back.filter(col("ts") < ranges(1)._1)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("ts"), p)
  }

  test("compaction: many small files rewrite to few, data identical, atomic swap") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val data = spark.range(1000L).select(col("id"), (col("id") % 7).as("g"))
    data.repartition(40).write.parquet(dir) // the small-file problem
    def fileCount = spark.read.parquet(dir).select(input_file_name()).distinct().count()
    assert(fileCount == 40)
    IO.compact(spark, dir, targetRows = 300)
    assert(fileCount == 4) // ceil(1000/300)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000 &&
      back.agg(sum("id")).head.getLong(0) == 999L * 1000 / 2)
  }

  test("upsert: same-key rows replaced, new keys appended, atomic rewrite") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-upsert").toString + "/t"
    Seq((1L, "old1"), (2L, "old2"), (3L, "old3")).toDF("k", "v").write.parquet(dir)
    IO.upsert(spark, dir,
      Seq((2L, "NEW2"), (9L, "NEW9")).toDF("k", "v"), "k")
    val m = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "old1", 2L -> "NEW2", 3L -> "old3", 9L -> "NEW9"))
    // MERGE source contract: duplicate or null update keys are rejected
    intercept[IllegalArgumentException] {
      IO.upsert(spark, dir, Seq((7L, "a"), (7L, "b")).toDF("k", "v"), "k")
    }
    intercept[IllegalArgumentException] {
      IO.upsert(spark, dir,
        Seq((Some(7L), "a"), (None, "b")).toDF("k", "v"), "k")
    }
    // and the failed validations left the table untouched
    assert(spark.read.parquet(dir).count() == 4)
  }

  test("schema evolution: mergeSchema unifies batches that added a column") {
    import spark.implicits._
    // batch 1 predates the 'score' column; batch 2 added it — the standard
    // corpus-evolves-over-time read pattern
    val dir = Files.createTempDirectory("graft-evo").toString
    Seq((1L, "a")).toDF("doc_id", "text").write.parquet(dir + "/batch=1")
    Seq((2L, "b", 0.9)).toDF("doc_id", "text", "score").write.parquet(dir + "/batch=2")
    val r = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(r.columns.sorted.sameElements(Array("batch", "doc_id", "score", "text")))
    val rows = r.orderBy("doc_id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score"))) // old rows null-fill
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) == 0.9)
    // the evolved layout stays readable without the option too (single
    // arbitrary footer) — evolution must never brick plain readers
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("ORC round-trip preserves the documents table with pushdown intact") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString + "/docs"
    graft.core.IO.writeOrc(docs, dir)
    val back = graft.core.IO.readOrc(spark, dir)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // the range predicate must reach the ORC scan, like parquet
    val p = back.filter(org.apache.spark.sql.functions.col("doc_id") < 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("doc_id"), p)
  }
}
