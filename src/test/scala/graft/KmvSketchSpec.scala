package graft

import org.apache.spark.sql.functions._
import graft.ops.KmvSketch

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private val K = KmvSketch.K

  // the whole algebra in plain Scala — the value-roundtrip reference (a
  // cross-engine hash match alone could share a bug with an oracle that
  // mirrors the engine's arithmetic)
  private def hash(k: Long): Long =
    (KmvSketch.HashA * k + KmvSketch.HashB) % KmvSketch.P
  private def brute(keys: Seq[Long]): Seq[Long] =
    keys.distinct.map(hash).distinct.sorted.take(K)
  private def bruteEst(keys: Seq[Long]): Double = {
    val sk = brute(keys)
    if (sk.size < K) sk.size.toDouble
    else KmvSketch.EstNumerator.toDouble / sk.max
  }

  private def collectSk(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("h").collect().map(_.getLong(0)).toSeq.sorted

  test("sketch == brute-force K smallest distinct hashes") {
    val keys = (1L to 5000L).map(j => j % 997L) // dups collapse
    val d = keys.toDF("k").withColumn("g", lit("all"))
    assert(collectSk(KmvSketch.sketch(d, Seq("g"), "k")) == brute(keys))
  }

  test("K-min merge law: merged partials == flat sketch; merge is idempotent") {
    val keys = (1L to 20000L).map(j => (j * j + 7) % 300007L)
    val d = keys.zipWithIndex.toDF("k", "i")
      .withColumn("g", lit("all")).withColumn("part", col("i") % 5)
    val parts = KmvSketch.sketch(d, Seq("g", "part"), "k")
    val merged = KmvSketch.merge(parts, Seq("g"))
    assert(collectSk(merged) == brute(keys))
    // idempotence: replaying the whole sketch into the merge is a no-op
    val replayed = KmvSketch.merge(merged.unionByName(merged), Seq("g"))
    assert(collectSk(replayed) == brute(keys))
  }

  test("unsaturated estimate is EXACT (permutation argument); saturated is accurate") {
    val small = (1L to 40L) ++ (1L to 40L) // 40 distinct < K
    val dSmall = small.toDF("k").withColumn("g", lit("all"))
    val eSmall = KmvSketch.estimate(KmvSketch.sketch(dSmall, Seq("g"), "k"), Seq("g"))
      .select("n_kept", "est").head()
    assert(eSmall.getLong(0) == 40L && eSmall.getDouble(1) == 40.0)
    val big = (1L to 50000L)
    val dBig = big.toDF("k").withColumn("g", lit("all"))
    val eBig = KmvSketch.estimate(KmvSketch.sketch(dBig, Seq("g"), "k"), Seq("g"))
      .select("est").head().getDouble(0)
    assert(eBig == bruteEst(big)) // value roundtrip
    assert(eBig > 25000.0 && eBig < 100000.0, s"est $eBig off 50000")
  }

  test("overlap: unsaturated pairs are EXACT set arithmetic; saturated in band") {
    def face(a: Seq[Long], b: Seq[Long]) = {
      val skA = KmvSketch.sketch(a.toDF("k").withColumn("g", lit("p")), Seq("g"), "k")
      val skB = KmvSketch.sketch(b.toDF("k").withColumn("g", lit("p")), Seq("g"), "k")
      KmvSketch.overlap(skA, skB, Seq("g"))
        .select("n_union_kept", "n_inter_kept", "union_est", "inter_est",
          "jaccard_est").head()
    }
    // both sides < K distinct: theta = P, everything kept, all EXACT
    val r = face(1L to 30L, 21L to 50L)
    assert(r.getLong(0) == 50L && r.getLong(1) == 10L)
    assert(r.getDouble(2) == 50.0 && r.getDouble(3) == 10.0)
    assert(r.getDouble(4) == 10.0 / 50.0)
    // saturated: |A|=10k, |B|=10k, |A∩B|=5k — jaccard 1/3; the estimates
    // replay the brute theta arithmetic exactly and land in band
    val a = 1L to 10000L
    val b = 5001L to 15000L
    val rs = face(a, b)
    val (ska, skb) = (brute(a), brute(b))
    val theta = math.min(
      if (ska.size == K) ska.max else KmvSketch.P,
      if (skb.size == K) skb.max else KmvSketch.P)
    val keptU = (ska ++ skb).distinct.filter(_ < theta)
    val keptI = ska.toSet.intersect(skb.toSet).filter(_ < theta)
    assert(rs.getLong(0) == keptU.size.toLong && rs.getLong(1) == keptI.size.toLong)
    assert(rs.getDouble(2) == keptU.size.toDouble * KmvSketch.P / theta)
    assert(rs.getDouble(3) == keptI.size.toDouble * KmvSketch.P / theta)
    assert(rs.getDouble(2) > 7500.0 && rs.getDouble(2) < 30000.0)
    assert(rs.getDouble(4) > 0.1 && rs.getDouble(4) < 0.6, s"jacc ${rs.getDouble(4)}")
  }
}
