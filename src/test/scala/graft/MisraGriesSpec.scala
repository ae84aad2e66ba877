package graft

import org.apache.spark.sql.functions._
import graft.ops.MisraGries

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private val K = MisraGries.K

  // order-free MG summary in plain Scala — the value-roundtrip reference
  // (a cross-engine hash match alone could share a bug with an oracle
  // that mirrors the engine's arithmetic)
  private def brute(occ: Seq[Long]): Map[Long, Long] = {
    val cnts = occ.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val sorted = cnts.values.toSeq.sorted(Ordering[Long].reverse)
    val d = if (sorted.size > K) sorted(K) else 0L // the (K+1)-th largest
    cnts.collect { case (k, c) if c > d => k -> (c - d) }
  }

  private def collectSummary(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select("k", "est").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  // zipf-ish ramp: key j occurs j times (j = 1..40) plus two heavy keys —
  // ties, a long tail, and clear heavy hitters all at once
  private val occ: Seq[Long] =
    (1L to 40L).flatMap(j => Seq.fill(j.toInt)(j)) ++
      Seq.fill(300)(777L) ++ Seq.fill(150)(888L)

  test("summary == order-free brute force; <= K counters; two-sided band") {
    val d = occ.toDF("k").withColumn("g", lit("all"))
    val got = collectSummary(MisraGries.summary(d, Seq("g"), "k"))
    assert(got == brute(occ))
    assert(got.size <= K)
    val exact = occ.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = occ.size.toLong
    got.foreach { case (k, est) =>
      assert(est <= exact(k), s"overestimate at $k")
      assert((exact(k) - est) * (K + 1) <= n, s"band violated at $k")
    }
    // every key above the frequency threshold N/(K+1) must be retained
    exact.foreach { case (k, c) =>
      if (c * (K + 1) > n) assert(got.contains(k), s"heavy key $k dropped")
    }
  }

  test("merged partial summaries keep the band against the UNION's mass") {
    // arbitrary 3-way split; merge(summaries) must satisfy the same laws
    // with N = the union's total (the PODS'12 mergeability theorem) even
    // though merge(sk(A), sk(B)) != sk(A ∪ B) pointwise
    val d = occ.zipWithIndex.toDF("k", "i")
      .withColumn("g", lit("all")).withColumn("part", col("i") % 3)
    val parts = MisraGries.summary(d, Seq("g", "part"), "k")
    val got = collectSummary(MisraGries.merge(parts, Seq("g")))
    assert(got.size <= K)
    val exact = occ.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = occ.size.toLong
    got.foreach { case (k, est) =>
      assert(est <= exact(k), s"overestimate at $k")
      assert((exact(k) - est) * (K + 1) <= n, s"merged band violated at $k")
    }
    exact.foreach { case (k, c) =>
      if (c * (K + 1) > n) assert(got.contains(k), s"heavy key $k dropped by merge")
    }
  }

  test("the merge is a SUM fold — replaying a summary double-counts") {
    // the fold-algebra placement the streaming ingest documents: unlike
    // Bloom's OR / HLL's max, merging a summary with ITSELF is not the
    // identity — ests double (minus a possibly larger offset)
    val d = occ.toDF("k").withColumn("g", lit("all"))
    val s1 = MisraGries.summary(d, Seq("g"), "k").localCheckpoint(true)
    val once = collectSummary(s1)
    val twice = collectSummary(
      MisraGries.merge(s1.unionByName(s1), Seq("g")))
    assert(twice != once)
    // the top key's doubled est confirms the mechanism is double-counting
    val top = once.maxBy(_._2)._1
    assert(twice(top) > once(top))
  }

  test("groups truncate independently; <= K distinct keys means exact") {
    val d = (occ.map(_ -> "skew") ++ (1L to 5L).map(_ -> "tiny"))
      .toDF("k", "g")
    val got = MisraGries.summary(d, Seq("g"), "k")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // tiny group: 5 distinct keys <= K, d = 0, ests are the exact counts
    (1L to 5L).foreach(k => assert(got((("tiny"), k)) == 1L))
    val skewGot = got.collect { case (("skew", k), e) => k -> e }
    assert(skewGot == brute(occ))
  }

  test("threshold-sized k: merged partition partials retain every T-heavy key") {
    // the heavyHittersMg sizing law: k = floor(N/T)+1 makes N/(k+1) < T,
    // so the merged summary must retain EVERY key with true count >= T —
    // whatever the partition cuts
    val n = occ.size.toLong
    val threshold = 40L
    val k = (n / threshold + 1L).toInt
    val d = occ.zipWithIndex.toDF("k", "i")
      .withColumn("g", lit("all")).withColumn("part", col("i") % 7)
    val parts = MisraGries.summary(d, Seq("g", "part"), "k", k)
    val retained = MisraGries.merge(parts, Seq("g"), k)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(retained.size <= k)
    val exact = occ.groupBy(identity).map { case (x, v) => x -> v.size.toLong }
    exact.foreach { case (key, c) =>
      if (c >= threshold) assert(retained.contains(key), s"T-heavy $key dropped")
    }
  }

  test("MG-pruned heavy hitters == CMS-pruned == plain GROUP BY HAVING") {
    import graft.ops.HeavyHitters
    val d = occ.toDF("k").repartition(9)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = rows(d.groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 30L))
    assert(rows(HeavyHitters.heavyHittersMg(d, "k", 30L)) == plain)
    assert(rows(HeavyHitters.heavyHittersAuto(d, "k", 30L)) == plain)
    assert(plain.nonEmpty)
  }

  test("summaryLocal: per-partition counter law (retention + lower bound), null key counted") {
    // one partition so the local law is checkable against exact counts:
    // every key with count > N/(k+1) holds a counter, and every counter
    // is a lower bound on its key's true count
    val k = 4
    val data: Seq[Option[Long]] =
      occ.map(Option(_)) ++ Seq.fill(3)(None: Option[Long])
    val df = data.toDF("k").coalesce(1)
    val out = MisraGries.summaryLocal(df, "k", k).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getLong(1))
      .toMap
    assert(out.size <= k)
    val exact: Map[Option[Long], Long] =
      data.groupBy(identity).map { case (x, v) => x -> v.size.toLong }
    val n = data.size.toLong
    exact.foreach { case (key, c) =>
      if (c > n / (k + 1)) assert(out.contains(key), s"law-heavy $key dropped")
    }
    out.foreach { case (key, est) =>
      assert(est >= 1L && est <= exact(key), s"counter $key=$est not a lower bound")
    }
    // and the pruned heavy-hitter route built on it stays exact across
    // many partitions
    import graft.ops.HeavyHitters
    val d9 = occ.toDF("k").repartition(9)
    val plain = d9.groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 12L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(HeavyHitters.heavyHittersMg(d9, "k", 12L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == plain && plain.nonEmpty)
  }
}
