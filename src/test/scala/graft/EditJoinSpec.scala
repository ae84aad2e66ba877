package graft

import org.apache.spark.sql.functions._
import graft.ops.EditJoin

class EditJoinSpec extends SparkSpec {
  import spark.implicits._

  // plain DP Levenshtein — the brute-force truth the blocked join must
  // reproduce (completeness is the FastSS property a parity oracle
  // cannot see: both engines share the blocking)
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("blocked join == brute-force all-pairs at distance <= 1") {
    // substitution, insertion, deletion, exact-duplicate, and far pairs;
    // plus a variant-sharing distance-2 pair (kitten/sittin shares no…
    // but kitte/sitten does via deletions) that the verify must reject
    val rows = Seq(
      1L -> "kitten", 2L -> "sitten", 3L -> "sittin", 4L -> "kitte",
      5L -> "kittten", 6L -> "kitten", 7L -> "apple", 8L -> "appl",
      9L -> "xapple", 10L -> "orange", 11L -> "aaa", 12L -> "aba")
    val blocked = EditJoin.pairsWithin1(rows.toDF("id", "s"), "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (i, a) <- rows; (j, b) <- rows if i < j
      d = lev(a, b) if d <= 1
    } yield (i, j, d.toLong)).toSet
    assert(blocked == brute,
      s"extra=${blocked -- brute} missing=${brute -- blocked}")
    // the fixture exercises every pair class: at least one of each
    assert(brute.exists(_._3 == 0L)) // duplicate strings
    assert(brute.exists(_._3 == 1L)) // within-1 neighbors
    assert(brute.size < rows.combinations(2).size) // far pairs rejected
  }

  test("grouped twin conserves the exploded pair mass exactly") {
    // duplicates (three 'kitten', two 'appl') force both row classes:
    // intra-group C(n,2) rows and inter-group n1*n2 rows. The grouped
    // result must carry EXACTLY the exploded form's pairs, re-stated:
    // total n_pairs == exploded row count, and each exploded pair's
    // (group(rep), group(rep)) key appears with the right multiplicity
    val rows = Seq(
      1L -> "kitten", 2L -> "kitten", 3L -> "kitten", 4L -> "sitten",
      5L -> "appl", 6L -> "appl", 7L -> "apple", 8L -> "orange")
    val df = rows.toDF("id", "s")
    val exploded = EditJoin.pairsWithin1(df, "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val grouped = EditJoin.pairsWithin1Grouped(df, "id", "s")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2), r.getLong(3)))
    assert(grouped.map(_._3).sum == exploded.length)
    // re-key each exploded pair by its strings' representatives and
    // count — must equal the grouped multiplicities row-for-row
    val rep = rows.groupBy(_._2).map { case (_, g) => g.map(_._1).min }
      .toSet
    val repOf = rows.toMap.map { case (id, s) =>
      id -> rows.filter(_._2 == s).map(_._1).min }
    val rekeyed = exploded.groupBy { case (i, j, _) =>
      val (a, b) = (repOf(i), repOf(j)); (math.min(a, b), math.max(a, b)) }
      .map { case (k, v) => (k, v.length.toLong) }
    val groupedMap = grouped.map { case (k, _, np) => (k, np) }.toMap
    assert(rekeyed == groupedMap,
      s"extra=${groupedMap.toSet -- rekeyed.toSet} missing=${rekeyed.toSet -- groupedMap.toSet}")
    assert(rep.size < rows.size) // the fixture really has duplicates
  }

  test("k=2 blocked join == brute-force all-pairs at distance <= 2") {
    // every distance-2 edit class: 2 substitutions, 2 insertions,
    // 2 deletions, sub+ins, sub+del, ins+del at different spots; plus
    // distance-3 pairs that SHARE depth-2 variants (must be rejected by
    // the verify) and 1-char strings whose only shared variant is the
    // EMPTY string (kept by design — dropping "" would lose them)
    val rows = Seq(
      1L -> "kitten", 2L -> "sitten", 3L -> "sittin", 4L -> "bitten",
      5L -> "kit", 6L -> "kitt", 7L -> "kittenxy", 8L -> "itten",
      9L -> "ktten", 10L -> "tten", 11L -> "skitten", 12L -> "sitteng",
      13L -> "a", 14L -> "b", 15L -> "ab", 16L -> "ba", 17L -> "xy",
      18L -> "orange", 19L -> "oranges", 20L -> "ranger")
    val blocked = EditJoin.pairsWithin2(rows.toDF("id", "s"), "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (i, a) <- rows; (j, b) <- rows if i < j
      d = lev(a, b) if d <= 2
    } yield (i, j, d.toLong)).toSet
    assert(blocked == brute,
      s"extra=${blocked -- brute} missing=${brute -- blocked}")
    // the fixture really exercises all three distances and rejects far pairs
    assert(Seq(0L, 1L, 2L).forall(d => brute.exists(_._3 == d) || d == 0L))
    assert(brute.exists(_._3 == 2L))
    assert(brute.size < rows.combinations(2).size)
    // the empty-variant path really fired: ("a","b") is distance 1 via
    // substitution but shares ONLY "" as a deletion variant
    assert(blocked.contains((13L, 14L, 1L)))
  }

  test("k=2 grouped twin conserves the exploded pair mass exactly") {
    val rows = Seq(
      1L -> "kitten", 2L -> "kitten", 3L -> "sittin", 4L -> "sitten",
      5L -> "appl", 6L -> "appl", 7L -> "apple", 8L -> "applesx",
      9L -> "orange")
    val df = rows.toDF("id", "s")
    val exploded = EditJoin.pairsWithin2(df, "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val grouped = EditJoin.pairsWithin2Grouped(df, "id", "s")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2), r.getLong(3)))
    assert(grouped.map(_._3).sum == exploded.length)
    val repOf = rows.toMap.map { case (id, s) =>
      id -> rows.filter(_._2 == s).map(_._1).min }
    val rekeyed = exploded.groupBy { case (i, j, _) =>
      val (a, b) = (repOf(i), repOf(j)); (math.min(a, b), math.max(a, b)) }
      .map { case (k, v) => (k, v.length.toLong) }
    val groupedMap = grouped.map { case (k, _, np) => (k, np) }.toMap
    assert(rekeyed == groupedMap)
  }

  test("k=2 budget guard refuses past maxCandidates with guidance") {
    val rows = (1L to 60L).map(i => i -> f"serial$i%04d")
    val e = intercept[IllegalArgumentException] {
      EditJoin.pairsWithin2(rows.toDF("id", "s"), "id", "s",
        maxCandidates = 10L)
    }
    assert(e.getMessage.contains("pairsWithin2") &&
      e.getMessage.contains("budget"))
  }

  test("k=2 on empty input prices as zero fan-out and returns empty") {
    // sum over zero bucket rows is NULL — must coalesce to 0, not throw
    // (r14 ADVICE); all-empty-string input takes the same path
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    assert(EditJoin.pairsWithin2(empty, "id", "s").count() == 0L)
    val blank = Seq((1L, ""), (2L, "")).toDF("id", "s")
    assert(EditJoin.pairsWithin2(blank, "id", "s").count() == 0L)
  }

  test("incremental join over stored index == batch join over the union") {
    // odd ids arrive as the batch; the stored state is the evens' variant
    // index + pairs. Includes cross-side pairs (kitten/sitten split) and
    // batch-internal pairs (appl/apple both odd)
    val rows = Seq(
      1L -> "kitten", 2L -> "sitten", 3L -> "appl", 4L -> "kitte",
      5L -> "apple", 6L -> "orange", 7L -> "orangs", 8L -> "kitten",
      9L -> "aaa", 10L -> "aba")
    val df = rows.toDF("id", "s")
    val existing = df.filter(col("id") % 2 === 0)
    val incoming = df.filter(col("id") % 2 === 1)
    val idx = EditJoin.variantIndex(existing, "id", "s")
    val stored = EditJoin.pairsWithin1(existing, "id", "s")
    val inc = EditJoin.incrementalPairsWithin1(idx, stored, incoming, "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = EditJoin.pairsWithin1(df, "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == batch, s"extra=${inc -- batch} missing=${batch -- inc}")
    // the fixture exercises cross-side AND batch-internal pairs
    assert(batch.exists { case (a, b, _) => a % 2 != b % 2 })
    assert(batch.exists { case (a, b, _) => a % 2 == 1 && b % 2 == 1 })
  }

  test("k=2 incremental join over stored depth-2 index == batch join over the union") {
    val rows = Seq(
      1L -> "kitten", 2L -> "sitten", 3L -> "appl", 4L -> "kite",
      5L -> "apple", 6L -> "orange", 7L -> "oran", 8L -> "kitten",
      9L -> "a", 10L -> "bc")
    val df = rows.toDF("id", "s")
    val existing = df.filter(col("id") % 2 === 0)
    val incoming = df.filter(col("id") % 2 === 1)
    val idx = EditJoin.variant2Index(existing, "id", "s")
    val stored = EditJoin.pairsWithin2(existing, "id", "s")
    val inc = EditJoin.incrementalPairsWithin2(idx, stored, incoming, "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = EditJoin.pairsWithin2(df, "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == batch, s"extra=${inc -- batch} missing=${batch -- inc}")
    // distance-2 pairs cross the batch boundary in the fixture
    assert(batch.exists { case (a, b, d) => d == 2L && a % 2 != b % 2 })
  }

  test("auto route: dup-free stays exploded (n_pairs=1), heavy dup collapses") {
    // dup-free: ratio 1.0 → exploded path, every row n_pairs = 1, raw ids
    val dupFree = Seq(1L -> "kitten", 2L -> "sitten", 3L -> "apple",
      4L -> "appl")
    val a1 = EditJoin.pairsWithin1Auto(dupFree.toDF("id", "s"), "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a1.nonEmpty && a1.forall(_._4 == 1L))
    assert(a1.map(t => (t._1, t._2, t._3)).toSet ==
      EditJoin.pairsWithin1(dupFree.toDF("id", "s"), "id", "s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    // 27 replicas of one identity (ratio 30/4 > 2) → grouped path: the
    // family collapses to ONE intra row carrying the C(27,2) mass
    val heavy = (1L to 27L).map(_ -> "kitten") ++
      Seq(28L -> "sitten", 29L -> "apple", 30L -> "orange")
    val a2 = EditJoin.pairsWithin1Auto(
        heavy.map { case (i, s) => (i, s) }.toDF("id", "s"), "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a2.contains((1L, 1L, 0L, 27L * 26 / 2)),
      s"collapsed intra row missing in ${a2.toSeq}")
    assert(a2.contains((1L, 28L, 1L, 27L))) // inter multiplicity n1*n2
  }

  test("k=2 auto route: dup-free conservation; grouped path passes the budget") {
    // dup-free → exploded path: auto == pairsWithin2 in grouped dress
    val dupFree = Seq(1L -> "kitten", 2L -> "ситтан", 3L -> "kifton",
      4L -> "apple", 5L -> "aple", 6L -> "orange")
    val a = EditJoin.pairsWithin2Auto(dupFree.toDF("id", "s"), "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.nonEmpty && a.forall(_._4 == 1L))
    assert(a.map(t => (t._1, t._2, t._3)).toSet ==
      EditJoin.pairsWithin2(dupFree.toDF("id", "s"), "id", "s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    // duplicate-heavy: the grouped route collapses BEFORE blocking, so a
    // budget the RAW relation would blow passes on the collapsed one —
    // the reason the guard is folded into the route
    val heavy = (1L to 40L).map(_ -> "kitten") ++
      Seq(41L -> "sitten", 42L -> "apple", 43L -> "orange")
    val rawFanout = {
      val vars = heavy.toDF("id", "s")
        .select(col("id"), explode(expr(EditJoin.variants2Expr("s"))).as("v"))
      vars.groupBy("v").agg(count(lit(1)).as("cnt"))
        .agg(sum(expr("cnt * cnt"))).first().getLong(0)
    }
    val budget = rawFanout - 1 // raw relation would refuse at this budget
    intercept[IllegalArgumentException] {
      EditJoin.pairsWithin2(heavy.toDF("id", "s"), "id", "s", budget)
    }
    val g = EditJoin.pairsWithin2Auto(heavy.toDF("id", "s"), "id", "s", budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(g.contains((1L, 1L, 0L, 40L * 39 / 2)))
    assert(g.contains((1L, 41L, 1L, 40L))) // inter multiplicity n1*n2
  }

  test("bucket sizes are structurally bounded — a shared-prefix corpus stays banded") {
    // 400 zero-padded serials (the customer-name shape): every deletion
    // variant bucket must stay under (L+1)*|alphabet|+1 even though all
    // strings share a 12-char prefix — the no-cap-needed claim
    val rows = (1L to 400L).map(i => i -> f"Customer#$i%09d")
    val vars = rows.toDF("id", "s")
      .select(col("id"), explode(expr(EditJoin.variantsExpr("s"))).as("v"))
    val maxDf = vars.groupBy("v").agg(count(lit(1)).as("df"))
      .agg(max("df")).first().getLong(0)
    val L = rows.head._2.length
    assert(maxDf <= (L + 1) * 10 + 1, s"maxDf=$maxDf")
  }
}
