package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Bpe, Corpus}
import graft.ops.RangeJoin

/** Hand-computed fixtures for corpus statistics, deterministic splits,
  * and the bucketized range join. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("vocabulary counts occurrences and doc frequencies") {
    val d = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val v = Corpus.vocabulary(d, 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(v.head == (("a", 3L, 2L)))
    assert(v.toSet == Set(("a", 3L, 2L), ("b", 1L, 1L), ("c", 1L, 1L)))
  }

  test("tfidf: rare term outranks corpus-wide term") {
    val d = Seq((1L, "x x shared"), (2L, "y shared")).toDF("doc_id", "text")
    val t = Corpus.tfidf(d, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(5)))
      .sortBy(r => (r._1, r._2))
    // doc1: x tf=2 df=1 -> 2*2/1=4; shared tf=1 df=2 -> 1*2/2=1
    assert(t.filter(_._1 == 1L).map(r => (r._3, r._4)).toList ==
      List(("x", 4.0), ("shared", 1.0)))
    assert(t.filter(_._1 == 2L).map(r => (r._3, r._4)).toList ==
      List(("y", 2.0), ("shared", 1.0)))
  }

  test("bigram counts: sliding windows per doc, no cross-doc grams") {
    val d = Seq((1L, "a b c"), (2L, "b c")).toDF("doc_id", "text")
    val g = Corpus.ngramCounts(d, 2, 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(g == Set(("a b", 1L), ("b c", 2L)))
    // docs shorter than n contribute nothing
    assert(Corpus.ngramCounts(Seq((1L, "solo")).toDF("doc_id", "text"), 2, 10).isEmpty)
  }

  test("pmi collocations: counts, minCount gate, factored IEEE score") {
    // unigrams: a:3 b:2 c:1, T=6; bigrams: "a b":2 "b a":1 "a c":1
    val d = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val p = Corpus.pmiCollocations(d, minCount = 2, topN = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    // only "a b" survives minCount=2; score replays the exact expression
    assert(p.toList == List(("a", "b", 2L, 3L, 2L, (2.0 / 3) * (6.0 / 2))))
    // minCount=1 admits all three, ranked by pmi then (w1, w2)
    val all = Corpus.pmiCollocations(d, 1, 10).collect()
      .map(r => (r.getString(0), r.getString(1))).toList
    assert(all.toSet == Set(("a", "b"), ("b", "a"), ("a", "c")))
  }

  test("hash split is partition-invariant and covers every document") {
    val d = (1L to 200L).map(i => (i, s"document number $i with text")).toDF("doc_id", "text")
    val s1 = Corpus.hashSplit(d).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = Corpus.hashSplit(d.repartition(7)).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 == s2)
    assert(s1.values.sum == 200L)
    assert(s1.keySet.subsetOf(Set("train", "val", "test")))
    assert(s1("train") > s1.getOrElse("val", 0L)) // 80/10/10 expectation, roughly
  }

  test("stratified sample is per-stratum bounded and partition-invariant") {
    val d = (1L to 50L).map(i => (i, s"text number $i", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val s1 = Corpus.stratifiedSample(d, "lang", 5).collect().map(_.toString).sorted
    assert(s1.length == 10)
    val s2 = Corpus.stratifiedSample(d.repartition(9), "lang", 5).collect().map(_.toString).sorted
    assert(s1.sameElements(s2))
  }

  test("systematic PPS sample: heavy doc repeats, zero-weight never drawn, partition-invariant") {
    // weights 1/100/1, W=102, n=2 -> probes at 102/4=25 and 3*102/4=76,
    // both inside doc 2's interval [1, 101) -> doc 2 drawn twice (PPS)
    val d = Seq((1L, "a", 1L), (2L, "b", 100L), (3L, "c", 1L))
      .toDF("doc_id", "text", "n_chars")
    val s = Corpus.systematicSample(d, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(s.toList == List((0L, 2L, 100L, 25L), (1L, 2L, 100L, 76L)))
    // zero-weight docs have empty intervals: never selected, and the
    // result is exactly n rows regardless of physical partitioning
    val z = Seq((1L, "a", 0L), (2L, "b", 10L), (3L, "c", 0L), (4L, "d", 10L))
      .toDF("doc_id", "text", "n_chars")
    val r1 = Corpus.systematicSample(z, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val r2 = Corpus.systematicSample(z.repartition(7), 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(r1.length == 4 && r1.forall(p => p._2 == 2L || p._2 == 4L))
    assert(r1.sameElements(r2))
  }

  test("bpe: classic low/lower/lowest merge sequence") {
    val d = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val (m, st) = Bpe.train(d, merges = 4)
    val ms = m.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    // (l,o) beats (o,w) on the lexicographic tie at count 5; then the
    // chain lo+w, low+e, and lowe+r (ties at 1 break by (lhs, rhs))
    assert(ms.toList == List(("l", "o", 5L), ("lo", "w", 5L),
      ("low", "e", 2L), ("lowe", "r", 1L)))
    val lowest = st.filter(col("word") === "lowest").orderBy("pos")
      .collect().map(_.getString(3))
    assert(lowest.toList == List("lowe", "s", "t"))
  }

  test("bpe: overlapping run merges greedily left-to-right") {
    // "aaaa": pair (a,a) counts 3 (overlapping occurrences, as in the
    // reference get_stats) but only positions 0 and 2 merge
    val d = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val (m, st) = Bpe.train(d, merges = 1)
    val head = m.collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).head
    assert(head == (("a", "a", 3L)))
    assert(st.orderBy("pos").collect().map(_.getString(3)).toList == List("aa", "aa"))
  }

  test("bpe: pair exhaustion stops the merge loop instead of crashing") {
    // "a b a" has single-char words only: round 1 has zero adjacent pairs,
    // so train must return 0 merges and the untouched state — the oracle's
    // win$i LIMIT 1 goes empty identically
    val d = Seq((1L, "a b a")).toDF("doc_id", "text")
    val (m0, st0) = Bpe.train(d, merges = 3)
    assert(m0.count() == 0L)
    assert(st0.collect().map(_.getString(3)).sorted.toList == List("a", "b"))
    // "ab" exhausts after ONE merge with two rounds still requested
    val (m1, st1) = Bpe.train(Seq((1L, "ab ab")).toDF("doc_id", "text"), merges = 3)
    assert(m1.collect().map(r => (r.getString(1), r.getString(2))).toList ==
      List(("a", "b")))
    assert(st1.collect().map(_.getString(3)).toList == List("ab"))
  }

  test("bpe batched: batch=1 degenerates exactly to sequential train") {
    // with B=1 the acceptance rule is just the argmax, so trainBatched
    // must replay train merge-for-merge and state-for-state
    val d = Seq((1L, "low low low lower lowest banana band")).toDF("doc_id", "text")
    val (mP, stP) = Bpe.train(d, merges = 4)
    val (mB, stB) = Bpe.trainBatched(d, rounds = 4, batch = 1)
    val p = mP.orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val b = mB.orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(p.sameElements(b))
    val sp = stP.select("word", "pos", "tok").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    val sb = stB.select("word", "pos", "tok").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    assert(sp.sameElements(sb))
  }

  test("bpe batched: disjoint merges land in one round, conflicts defer") {
    // "ab ab cd": (a,b)=2 and (c,d)=1 share no symbol — both accepted in
    // round ONE (ranks 1, 2), the whole point of batching
    val d = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val (m, st) = Bpe.trainBatched(d, rounds = 1, batch = 8)
    assert(m.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toList ==
      List(("a", "b", 2L), ("c", "d", 1L)))
    assert(st.collect().map(_.getString(3)).sorted.toList == List("ab", "cd"))
    // the low-corpus chain under the GREEDY accept-vs-accepted rule
    // (r13): (o,w) shares o with the ACCEPTED (l,o) and defers, but
    // (w,e) conflicts only with the REJECTED (o,w), so it joins round 1
    // — the case the old stricter rule (reject on any higher-RANKED
    // conflict) wrongly serialized, measured at ~2-3 accepted
    // merges/round at vocabulary depth. Hand trace: round 1 accepts
    // (l,o,5),(w,e,2),(s,t,1); round 2 over the rewritten state accepts
    // (lo,w,3) and (we,r,1) ((lo,we) defers on lo, (we,st) on we)
    val low = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val (m2, _) = Bpe.trainBatched(low, rounds = 2, batch = 8)
    assert(m2.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toList ==
      List(("l", "o", 5L), ("w", "e", 2L), ("s", "t", 1L),
        ("lo", "w", 3L), ("we", "r", 1L)))
  }

  test("bpe batched: aa-run merge keeps the greedy even offsets under batching") {
    // the a==b run case inside a batch: "aaaa cd" accepts (a,a) and (c,d)
    // together; only positions 0 and 2 of aaaa merge
    val d = Seq((1L, "aaaa cd")).toDF("doc_id", "text")
    val (m, st) = Bpe.trainBatched(d, rounds = 1, batch = 8)
    assert(m.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toList ==
      List(("a", "a"), ("c", "d")))
    assert(st.filter(col("word") === "aaaa").orderBy("pos")
      .collect().map(_.getString(3)).toList == List("aa", "aa"))
  }

  test("bpe: encode with the learned merges reproduces the training tokenization") {
    val d = Seq((1L, "banana band bans"), (2L, "banana banana bandana"))
      .toDF("doc_id", "text")
    val (m, st) = Bpe.train(d, merges = 5)
    val merges = m.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Bpe.encode(st.select("word").distinct(), merges)
    val a = st.select("word", "pos", "tok").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    val b = enc.select("word", "pos", "tok").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    assert(a.sameElements(b))
  }

  test("bpe: round-batched encode reproduces the batched-training tokenization") {
    // the encodeBatched contract (r13): deployment replays each training
    // round's accepted set round-SIMULTANEOUSLY — the exact rewrite the
    // trainer used on its own state — so encoding the training words
    // with the learned groups must reproduce the final training state
    // token-for-token (the batched twin of the sequential test above;
    // merge-sequential replay would NOT satisfy this when a round
    // accepts (a,b) and a later-created symbol collides)
    val d = Seq((1L, "banana band bans low lower lowest"),
      (2L, "banana banana bandana slows slowest")).toDF("doc_id", "text")
    val (groups, st) = Bpe.trainBatchedGrouped(d, rounds = 3, batch = 4)
    val enc = Bpe.encodeBatched(st.select("word").distinct(),
      groups.map(_.map { case (a, b, _) => (a, b) }))
    val a = st.select("word", "pos", "tok").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    val b = enc.select("word", "pos", "tok").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    assert(a.sameElements(b))
    assert(groups.map(_.size).sum >= 3 && groups.exists(_.size > 1),
      s"fixture too thin to exercise batching: ${groups.map(_.size)}")
  }

  test("mixture weights: sqrt temperature damps the head source") {
    val d = ((1 to 9).map(i => (i.toLong, "t", "s_big")) ++ Seq((10L, "t", "s_small")))
      .toDF("doc_id", "text", "source")
    // sqrt(9)=3, sqrt(1)=1, z=4: raw 0.9/0.1 share damps to 0.75/0.25
    val m = Corpus.mixtureWeights(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(m("s_big") == ((9L, 0.75, 7L)))   // floor(0.75 * 10)
    assert(m("s_small") == ((1L, 0.25, 2L)))
  }

  test("mixture sample takes min(target_n, available) docs per source") {
    val d = ((1 to 9).map(i => (i.toLong, s"text number $i", "s_big"))
      ++ Seq((10L, "tiny", "s_small"))).toDF("doc_id", "text", "source")
    // targets: s_big 7, s_small 2 — but s_small only has 1 doc to give
    val got = Corpus.mixtureSample(d).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("s_big" -> 7L, "s_small" -> 1L))
    // determinism: repartitioned input picks the identical sample
    val again = Corpus.mixtureSample(d.repartition(7)).collect().map(_.toString).sorted
    assert(Corpus.mixtureSample(d).collect().map(_.toString).sorted.sameElements(again))
  }

  test("token-budget mixture: quotas are hard caps, prefix cut by running token sum") {
    // s_big: 9 docs x 1 token ("abc" -> ceil(3/4)=1); s_small: 1 doc x 1
    val d = ((1 to 9).map(i => (i.toLong, "abc", "s_big")) ++ Seq((10L, "abc", "s_small")))
      .toDF("doc_id", "text", "source")
    // weights 0.75/0.25; budget 8 -> quotas floor(6.0)=6 and floor(2.0)=2
    val got = Corpus.tokenBudgetMixture(d, 8L)
      .groupBy("source").agg(count(lit(1)).as("n"), max("cum_tokens").as("cum"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("s_big") == ((6L, 6L)))   // 6 of 9 docs fit the 6-token quota
    assert(got("s_small") == ((1L, 1L))) // quota 2, only 1 doc exists
    // the first OVERFLOWING doc is excluded, not truncated: quota 6 with
    // 4-token docs ("abcdefgh ijklmnop" -> 2+2) keeps 1 doc (4 <= 6), the
    // next lands at 8 > 6 and drops
    val wide = (1 to 3).map(i => (i.toLong, "abcdefgh ijklmnop", "s")).toDF("doc_id", "text", "source")
    val w = Corpus.tokenBudgetMixture(wide, 6L).collect()
    assert(w.length == 1 && w.head.getLong(3) == 4L)
    // determinism across partitionings
    val again = Corpus.tokenBudgetMixture(d.repartition(7), 8L).collect().map(_.toString).sorted
    assert(Corpus.tokenBudgetMixture(d, 8L).collect().map(_.toString).sorted.sameElements(again))
  }

  test("inverted index: sorted postings, cut to the top-df terms") {
    val d = Seq((3L, "a b"), (1L, "a c"), (2L, "a b")).toDF("doc_id", "text")
    val ix = Corpus.invertedIndex(d, 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(ix == Set(("a", 3L, "1,2,3"), ("b", 2L, "2,3"))) // c (df 1) cut
  }

  test("range join: pairs within delta exactly once, bucket boundaries included") {
    // delta=10; ts 9 and 19 straddle a bucket boundary with gap exactly 10
    val e = Seq((1L, 10L, 9L), (1L, 11L, 11L), (1L, 12L, 19L), (1L, 13L, 30L), (2L, 20L, 9L))
      .toDF("user_id", "event_id", "ms")
    val p = RangeJoin.pairsWithin(e, "user_id", "event_id", "ms", 10L)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(p.length == p.toSet.size, "a pair was produced twice")
    assert(p.toSet == Set((10L, 11L), (10L, 12L), (11L, 12L)))
  }
}
