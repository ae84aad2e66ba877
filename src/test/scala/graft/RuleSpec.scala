package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, TextHash}
import graft.plans.JaccardPrefilter

/** The Jaccard size-ratio prefilter rule: fires on the canonical predicate,
  * changes the plan, never changes results.
  */
class RuleSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations = Seq(JaccardPrefilter)
    try f finally spark.experimental.extraOptimizations = Nil
  }

  // parquet-backed input so the optimizer cannot constant-fold the whole
  // pipeline into a LocalRelation (which would hide the Filter)
  private lazy val pairsPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-rule").toString
    Seq(
      (1L, Seq(1L, 2L, 3L, 4L), 2L, Seq(1L, 2L, 3L, 5L)),   // jacc 3/5 = 0.6
      (3L, Seq(1L, 2L), 4L, Seq(1L, 2L, 3L, 4L, 5L, 6L)),   // sizes 2 vs 6: guard kills
      (5L, Seq(7L, 8L), 6L, Seq(9L, 10L)),                  // jacc 0
    ).toDF("doc_a", "hs_a", "doc_b", "hs_b").write.mode("overwrite").parquet(dir)
    dir
  }
  private def pairs = spark.read.parquet(pairsPath)

  private def jaccFiltered = pairs
    .withColumn("jacc", expr(TextHash.jaccardSpark("hs_a", "hs_b")))
    .filter(col("jacc") >= 0.5)
    .select("doc_a", "doc_b", "jacc")

  test("rule injects the size-ratio guard into the optimized plan") {
    def sizeRefs(p: String) = p.split("size\\(hs_a").length
    val without = jaccFiltered.queryExecution.optimizedPlan.toString
    val withPlan = withRule(jaccFiltered.queryExecution.optimizedPlan.toString)
    // the guard multiplies the threshold by the array sizes — a shape the
    // unoptimized plan does not contain
    assert(!without.contains("* cast(size("), without)
    assert(withPlan.contains("* cast(size("), withPlan)
    assert(sizeRefs(withPlan) > sizeRefs(without))
  }

  private def kernelFiltered = pairs
    .withColumn("jacc", graft.functions.GraftFunctions.jaccard(col("hs_a"), col("hs_b")))
    .filter(col("jacc") >= 0.5)
    .select("doc_a", "doc_b", "jacc")

  test("rule fires on the graft_jaccard kernel form too") {
    val without = kernelFiltered.queryExecution.optimizedPlan.toString
    val withPlan = withRule(kernelFiltered.queryExecution.optimizedPlan.toString)
    assert(!without.contains("* cast(size("), without)
    assert(withPlan.contains("* cast(size("), withPlan)
    val plain = kernelFiltered.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ruled = withRule(kernelFiltered.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(plain == ruled && ruled == Set((1L, 2L)))
  }

  test("results identical with and without the rule") {
    val plain = jaccFiltered.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ruled = withRule(jaccFiltered.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(plain == ruled)
    assert(ruled == Set((1L, 2L)))
  }

  test("rule leaves minhashDedup results unchanged on the corpus") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val plain = Dedup.minhashDedup(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ruled = withRule(Dedup.minhashDedup(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(plain == ruled && plain.nonEmpty)
  }

  test("TopKPerKey equals the window formulation, on skewed keys and at k > group size") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // key 1 is hot (200 rows) with forced value ties (v = i % 7), so the
    // unique tiebreak (id) actually decides; key 2 has fewer rows than k
    val df = ((1 to 200).map(i => (1L, i.toLong % 7, i.toLong)) ++
      (1 to 2).map(i => (2L, i.toLong, 100L + i)))
      .toDF("k", "v", "id").repartition(8)
    val custom = graft.plans.TopKPerKey(df, Seq("k"), Seq(("v", false), ("id", true)), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy("k").orderBy(desc("v"), asc("id"))
    val window = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .drop("rn").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(custom == window)
    assert(custom.count(_._1 == 2L) == 2) // under-full group passes through whole
  }

  test("TopKPerKey null ordering matches the window default (DESC => NULLS LAST)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1L, Some(5L), 1L), (1L, None, 2L), (1L, Some(7L), 3L),
      (1L, None, 4L), (1L, Some(1L), 5L))
      .toDF("k", "v", "id").repartition(4)
    val custom = graft.plans.TopKPerKey(df, Seq("k"), Seq(("v", false), ("id", true)), 3)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).toSet
    val w = Window.partitionBy("k").orderBy(desc("v"), asc("id"))
    val window = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .drop("rn").collect().map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).toSet
    assert(custom == window) // 7, 5, 1 kept; both nulls sort last and drop
  }

  // --- WindowTopKRewrite: row_number <= k idiom -> heap operator ---

  private def withTopKRewrite[T](f: => T): T = {
    // the shared test session has no GraftExtensions (deliberate — see
    // SparkSpec); register the rule AND the strategy the node needs,
    // exactly as GraftExtensions pairs them
    spark.experimental.extraOptimizations = Seq(graft.plans.WindowTopKRewrite)
    val hadStrategy =
      spark.experimental.extraStrategies.contains(graft.plans.TopKPerKeyStrategy)
    if (!hadStrategy)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKPerKeyStrategy
    try f finally {
      spark.experimental.extraOptimizations = Nil
      if (!hadStrategy)
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies.filterNot(_ == graft.plans.TopKPerKeyStrategy)
    }
  }

  private lazy val rankedPath: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-topkrw").toString
    (1 to 400).map(i => ((i % 7).toLong, (i * 31 % 101).toLong, i.toLong))
      .toDF("k", "v", "id").write.mode("overwrite").parquet(dir)
    dir
  }
  private def ranked = spark.read.parquet(rankedPath)

  private def topkIdiom(kLimit: Int) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy(desc("v"), asc("id"))
    ranked.withColumn("rn", row_number().over(w)).filter(col("rn") <= kLimit).drop("rn")
  }

  test("WindowTopKRewrite replaces the window with the heap operator, same rows") {
    val without = topkIdiom(3).queryExecution.executedPlan.toString
    assert(without.contains("Window") && !without.contains("TopKPerKey"), without)
    withTopKRewrite {
      val plan = topkIdiom(3).queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey") && !plan.contains("Window"), plan)
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(withTopKRewrite(rows(topkIdiom(3))) == rows(topkIdiom(3)))
    // the rn = 1 (latest-per-key) form rewrites too
    withTopKRewrite {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("k").orderBy(desc("v"), asc("id"))
      val latest = ranked.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      assert(latest.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(latest.count() == 7)
    }
  }

  test("WindowTopKRewrite leaves non-eligible shapes alone") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy(desc("v"), asc("id"))
    withTopKRewrite {
      // rn kept in the output: ranks are observable, no rewrite
      val keepsRn = ranked.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).select("k", "rn", "id")
      assert(keepsRn.queryExecution.executedPlan.toString.contains("Window"))
      // pagination lower bound: not a top-k
      val pagination = ranked.withColumn("rn", row_number().over(w))
        .filter(col("rn") >= 2 && col("rn") <= 4).drop("rn")
      assert(pagination.queryExecution.executedPlan.toString.contains("Window"))
      // rank(): duplicate ranks are not heap-representable, no rewrite
      val rankFn = ranked.withColumn("rn", rank().over(w))
        .filter(col("rn") <= 3).drop("rn")
      assert(rankFn.queryExecution.executedPlan.toString.contains("Window"))
      // rn under a disjunction: the bound is not unconditional, no rewrite
      val disjunct = ranked.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3 || col("v") > 50).drop("rn")
      assert(disjunct.queryExecution.executedPlan.toString.contains("Window"))
      // kill switch
      spark.conf.set("spark.graft.windowTopKRewrite", "false")
      try assert(topkIdiom(3).queryExecution.executedPlan.toString.contains("Window"))
      finally spark.conf.unset("spark.graft.windowTopKRewrite")
    }
  }

  test("WindowTopKRewrite stats-based skip: proven huge-cardinality keys keep the window") {
    import org.apache.spark.sql.expressions.Window
    // column stats only exist through the catalog (ANALYZE ... FOR COLUMNS)
    // with CBO on; the parquet-path idiom tests above run stats-less and
    // must keep rewriting (the status-quo branch of heapFitsBudget)
    spark.sql("DROP TABLE IF EXISTS graft_topk_stats")
    (1 to 400).map(i => ((i % 7).toLong, (i * 31 % 101).toLong, i.toLong))
      .toDF("k", "v", "id").write.saveAsTable("graft_topk_stats")
    spark.sql("ANALYZE TABLE graft_topk_stats COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try withTopKRewrite {
      def idiom = {
        val w = Window.partitionBy("k").orderBy(desc("v"), asc("id"))
        spark.table("graft_topk_stats")
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).drop("rn")
      }
      // 7 keys x 3 x tiny rows fits any sane budget: rewrite fires
      assert(idiom.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      // with a budget the stats PROVE the heap exceeds, the window stays
      spark.conf.set("spark.graft.windowTopKRewrite.heapBudgetBytes", "64")
      try {
        val plan = idiom.queryExecution.executedPlan.toString
        assert(plan.contains("Window") && !plan.contains("TopKPerKey"), plan)
      } finally spark.conf.unset("spark.graft.windowTopKRewrite.heapBudgetBytes")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql("DROP TABLE IF EXISTS graft_topk_stats")
    }
  }

  test("the catalog's latest-per-key query rewrites to the heap operator") {
    withTopKRewrite {
      val df = graft.SparkEntry.queries("q_events_latest")(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey") && !plan.contains("Window"), plan)
    }
  }

  test("WindowTopKRewrite keeps non-rank filter conjuncts above the top-k") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy(desc("v"), asc("id"))
    def idiom = ranked.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 && col("v") % 2 === 0).drop("rn")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // rank over ALL rows, then the v-predicate — rewriting must not rank
    // over the pre-filtered rows (which would admit lower-ranked evens)
    val expected = rows(idiom)
    withTopKRewrite {
      assert(idiom.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(rows(idiom) == expected)
    }
  }
}
