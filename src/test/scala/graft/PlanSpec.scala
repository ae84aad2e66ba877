package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape regression guards for the headline queries: these properties
  * (pushdown, pruning, broadcast, top-k short-circuit, shared window sort)
  * are what make the queries scale, and the bench is too noisy to catch a
  * silent plan regression at sf0.1 — so assert the plans directly.
  */
class PlanSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.explainString(FormattedMode)

  private def countOp(p: String, op: String): Int =
    s"(?m)^\\s*\\(\\d+\\) $op\\b".r.findAllIn(p).length

  test("q_filter_range pushes its range predicate into the parquet scan") {
    val p = plan("q_filter_range")
    assert(p.contains("PushedFilters:"), p)
    assert("PushedFilters:[^\\n]*l_quantity".r.findFirstIn(p).isDefined, p)
  }

  test("q_agg_count prunes the orders scan to the grouping column") {
    val p = plan("q_agg_count")
    val read = "ReadSchema:[^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(read.contains("o_custkey"), p)
    assert(!read.contains("o_totalprice") && !read.contains("o_orderdate"), read)
  }

  test("q_join_broadcast broadcasts the dim side") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"), plan("q_join_broadcast"))
  }

  test("q_topk plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(countOp(p, "Sort") == 0, p)
  }

  test("sessionize plans exactly one sort for both window functions") {
    // lag() and the running sum share partition+order, so Catalyst must
    // plan a single Sort for the two Window operators (plus the final
    // ORDER BY contract sort) — 2 sorts total
    val p = plan("q_events_sessionize")
    assert(countOp(p, "Window") >= 1, p)
    assert(countOp(p, "Sort") <= 2, p)
  }

  test("dedup band joins are equi-joins, never cartesian") {
    for (q <- Seq("q_dedup_minhash", "q_dedup_simhash", "q_dedup_embedding",
        "q_dedup_incremental")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
    }
  }

  test("lsh top-k broadcasts query buckets and never plans a cartesian") {
    val p = plan("q_sim_lsh")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("shuffle_hash hint plans a ShuffledHashJoin") {
    assert(plan("q_join_shuffle_hash").contains("ShuffledHashJoin"),
      plan("q_join_shuffle_hash"))
  }

  test("range join plans an equi-join on (key, bucket), not a theta join") {
    val p = plan("q_events_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("tfidf plans one window sort and broadcasts the corpus-size scalar") {
    val p = plan("q_text_tfidf")
    assert(countOp(p, "Window") == 1, p)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"), p)
  }

  test("tpch q3 broadcasts the filtered customer dim and pushes both date filters") {
    val p = plan("q_tpch_q3")
    assert(p.contains("BroadcastHashJoin"), p)
    assert("PushedFilters:[^\\n]*l_shipdate".r.findFirstIn(p).isDefined, p)
    assert("PushedFilters:[^\\n]*o_orderdate".r.findFirstIn(p).isDefined, p)
    // the segment filter must also reach the customer scan
    assert("PushedFilters:[^\\n]*c_mktsegment".r.findFirstIn(p).isDefined, p)
  }

  test("tpch q5 broadcasts the region-filtered nation list") {
    val p = plan("q_tpch_q5")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("range-frame window plans one sort besides the output contract sort") {
    val p = plan("q_window_range_frame")
    assert(countOp(p, "Window") == 1, p)
    assert(countOp(p, "Sort") <= 2, p)
  }

  test("context packing sorts only within source shards plus the contract sort") {
    // the window partitions by source — no global sort before the final
    // ORDER BY, so shards pack independently at scale
    val p = plan("q_pack_contexts")
    assert(countOp(p, "Window") == 1, p)
    assert(countOp(p, "Sort") <= 2, p)
  }

  test("training prep reads documents once and never plans a cartesian") {
    // redact/tokenize/fingerprint share one projection — a second scan
    // would mean the pipeline re-tokenizes (the dominant cost at 100 TB)
    val p = plan("q_prep_training")
    assert(countOp(p, "Scan parquet") == 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("corpus fingerprint is a pure scan+hash-agg — no join, no window") {
    val p = plan("q_corpus_fingerprint")
    assert(countOp(p, "Window") == 0, p)
    assert(!p.contains("Join"), p)
  }

  test("tpch q1 pushes the date filter; q17's correlated subquery decorrelates") {
    val p1 = plan("q_tpch_q1")
    assert("PushedFilters:[^\\n]*l_shipdate".r.findFirstIn(p1).isDefined, p1)
    // one aggregate pass over the scan (partial+final pair), no join
    assert(!p1.contains("Join"), p1)
    val p17 = plan("q_tpch_q17")
    // Catalyst must rewrite the correlated scalar subquery into an
    // aggregate + join — never a per-row nested-loop re-execution
    assert(!p17.contains("CartesianProduct"), p17)
    assert(countOp(p17, "HashAggregate") >= 2, p17) // per-part avg + outer sum
  }

  test("decontamination broadcasts the eval gram set; common-neighbors takes ordered-limit") {
    // the corpus side must never shuffle: the benchmark grams broadcast
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(countOp(p, "SortMergeJoin") == 0, p)
    // top-k link prediction short-circuits instead of a global sort
    val cn = plan("q_graph_commonneighbors")
    assert(cn.contains("TakeOrderedAndProject"), cn)
  }

  test("round-5 queries: broadcast stats joins, no cartesian in containment") {
    // zscore: the per-group stats table must broadcast — the fact side
    // never shuffles for the join
    val z = plan("q_feature_zscore")
    assert(z.contains("BroadcastHashJoin"), z)
    // assoc rules: the 1-row totals table rides a broadcast (nested-loop
    // for the keyless cross), never a shuffled cartesian of the rules
    val a = plan("q_assoc_rules")
    assert(a.contains("BroadcastNestedLoopJoin") || a.contains("BroadcastHashJoin"), a)
    assert(!a.contains("CartesianProduct"), a)
    // containment: the posting-list self-join is an equi-join on the
    // shingle hash — any cartesian here would be the quadratic pair space
    val c = plan("q_dedup_containment")
    assert(!c.contains("CartesianProduct"), c)
  }

  test("topk-per-key plans two heap passes around one exchange and never sorts the groups") {
    val p = plan("q_topk_per_key")
    // partial pass under the key exchange + final pass above it
    assert(countOp(p, "TopKPerKey") == 2, p)
    // the window formulation this operator replaces would plan Window +
    // a full per-partition Sort under it; the only Sort allowed here is
    // the query's final presentation ORDER BY
    assert(!p.contains("Window"), p)
    assert(countOp(p, "Sort") <= 1, p)
  }

  test("quality model is one projection pass: no join, no window, one contract sort") {
    val p = plan("q_quality_model")
    assert(countOp(p, "BroadcastHashJoin") + countOp(p, "SortMergeJoin")
      + countOp(p, "ShuffledHashJoin") == 0, p)
    assert(!p.contains("Window"), p)
    // only the output-contract ORDER BY may exchange/sort
    assert(countOp(p, "Exchange") <= 1 && countOp(p, "Sort") <= 1, p)
  }

  test("priority sample prunes to top-k per partition BEFORE the exchange") {
    // Spark's rank-limit pushdown (WindowGroupLimit) is the bounded-heap
    // behavior: a partial group-limit below the shuffle, final above —
    // without it every source's full doc list would sort on one task
    val p = plan("q_sample_priority")
    assert(countOp(p, "WindowGroupLimit") == 2, p)
  }

  test("boilerplate scrub keeps the islands sweep on one exchange+sort pair") {
    val p = plan("q_dedup_boilerplate")
    // both window passes of Intervals.coalesce must share one sort; with
    // the contract ORDER BY that caps the plan at 2 sorts total
    assert(countOp(p, "Window") == 2, p)
    assert(countOp(p, "Sort") <= 2, p)
    // and nothing in the frequency path may plan a cartesian
    assert(!p.contains("CartesianProduct"), p)
  }

  test("novelty never plans a cartesian and aggregates before joining back") {
    val p = plan("q_text_novelty")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
  }

  test("importance score broadcasts the target gram relation, never goes pairwise") {
    val p = plan("q_sample_importance")
    // the curated-slice df relation rides a broadcast; the raw side is
    // linear — no doc-pair join, no window anywhere in the score path
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window "), p)
  }

  test("cluster-quota sample prunes per-partition tops before the exchange") {
    // same rank-limit-pushdown contract as q_sample_priority: a giant
    // topic cluster must never full-sort on one task
    val p = plan("q_sample_cluster")
    assert(countOp(p, "WindowGroupLimit") == 2, p)
  }

  test("walk pair aggregation is a walk-keyed equi-join with partial aggregation") {
    val p = plan("q_graph_walk_pairs")
    assert(!p.contains("CartesianProduct"), p)
    // partial + final pair counts around the (center, context) exchange
    assert(countOp(p, "HashAggregate") >= 2, p)
  }

  test("selection pipeline prunes per-feed tops before the exchange, no cartesian") {
    val p = plan("q_select_training")
    assert(countOp(p, "WindowGroupLimit") == 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("walk negatives select top-k on a bounded heap, never a global sort") {
    // the NegK cut must plan TakeOrderedAndProject (partial heaps per
    // partition, merge on the driver) — a 100 TB walk corpus's candidate
    // relation must never full-sort; the only Sort is the output-contract
    // ORDER BY over the k selected rows
    val p = plan("q_graph_walk_negatives")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(countOp(p, "Sort") <= 1, p)
    // the slot fan-out must ride a broadcast of the tiny range, never a
    // shuffle-side cartesian
    assert(!p.contains("CartesianProduct"), p)
  }

  test("winnow pair join is a fp equi-join; the cap side broadcasts") {
    // the fingerprint self-join must be a hash equi-join on fp (never a
    // cartesian / nested-loop over docs), and the capped twin's hot-print
    // exclusion must ship the tiny hot relation broadcast, not shuffle
    // the posting relation against it
    for (q <- Seq("q_dedup_winnow", "q_dedup_winnow_capped", "q_dedup_winnow_inc")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q: $p")
    }
    val pc = plan("q_dedup_winnow_capped")
    assert(pc.contains("BroadcastHashJoin"), pc)
  }

  test("semi-hard negatives broadcast the anchors and band-filter before ranking") {
    // same scan shape as q_sim_topk: the tiny anchor set broadcasts over
    // the streamed corpus (BroadcastNestedLoopJoin is the intended plan —
    // it IS the brute scan), and the [floor, ceil) band must appear as a
    // Filter on the rounded score so the per-anchor ranking state holds
    // only banded candidates — ranking the full pair relation first would
    // erase the band's pruning at a real corpus
    val p = plan("q_sim_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // formatted-explain operator ids number the tree bottom-up (scans
    // lowest, root highest), so "the band Filter sits upstream of the
    // ranking window" means: some Filter whose details block mentions the
    // 0.3 band ceiling carries a SMALLER plan-step id than the Window
    // node — compare the ids, not string offsets (a regression that ranks
    // the full pair relation before band-filtering must fail here)
    val headers = "(?m)^\\s*\\((\\d+)\\) ([A-Za-z]+)".r.findAllMatchIn(p).toSeq
    val blocks = headers.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < headers.length) headers(i + 1).start else p.length
      (m.group(1).toInt, m.group(2), p.substring(m.start, end))
    }
    val windowId = blocks.collectFirst { case (id, "Window", _) => id }
    // Catalyst pushes the band predicate into the join condition itself
    // (BroadcastNestedLoopJoin node) when it can — either a standalone
    // Filter or the join node carrying the 0.3 ceiling counts, as long
    // as it evaluates BEFORE the ranking Window
    val bandNodeIds = blocks.collect {
      case (id, op, b)
        if (op == "Filter" || op == "BroadcastNestedLoopJoin") &&
          b.contains("0.3") => id }
    assert(windowId.nonEmpty, p)
    assert(bandNodeIds.nonEmpty && bandNodeIds.min < windowId.get, p)
  }

  test("quantile sketch: map-side histogram partials sit below the first exchange") {
    // the sketch's 100 TB claim is that raw rows are absorbed into
    // (group, bkt) histogram partials BEFORE anything moves — so the
    // first Exchange in the plan must sit ABOVE a HashAggregate keyed on
    // bkt (formatted-explain ids number bottom-up, scans lowest)
    val p = plan("q_agg_quantile_merge")
    val headers = "(?m)^\\s*\\((\\d+)\\) ([A-Za-z]+)".r.findAllMatchIn(p).toSeq
    val blocks = headers.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < headers.length) headers(i + 1).start else p.length
      (m.group(1).toInt, m.group(2), p.substring(m.start, end))
    }
    val firstBktAgg = blocks.collect {
      case (id, "HashAggregate", b) if b.contains("bkt") => id }
    val firstExchange = blocks.collect { case (id, "Exchange", _) => id }
    assert(firstBktAgg.nonEmpty && firstExchange.nonEmpty, p)
    assert(firstBktAgg.min < firstExchange.min, p)
  }

  test("cms/bloom sketches: cell partials sit below the first exchange") {
    // same 100 TB claim as the quantile guard for the other two sketch
    // families: raw rows fold into (group, r, c) cell partials — a
    // HashAggregate (cms counts) or a partial-distinct HashAggregate
    // (bloom bits) keyed on the cell column — BEFORE the cell shuffle,
    // so that exchange carries sketch cells, never raw keys. The plan
    // has several branches (probes, exact counts), so the assertion is
    // local, not global: SOME cell-keyed HashAggregate must sit
    // IMMEDIATELY below an Exchange (adjacent formatted-plan ids — a
    // child's id precedes its parent's within a linear segment)
    for (q <- Seq("q_agg_cms_merge", "q_agg_bloom_merge")) {
      val p = plan(q)
      val headers = "(?m)^\\s*\\((\\d+)\\) ([A-Za-z]+)".r.findAllMatchIn(p).toSeq
      val blocks = headers.zipWithIndex.map { case (m, i) =>
        val end = if (i + 1 < headers.length) headers(i + 1).start else p.length
        (m.group(1).toInt, m.group(2), p.substring(m.start, end))
      }
      val exchangeIds = blocks.collect { case (id, "Exchange", _) => id }.toSet
      val partialBelowShuffle = blocks.exists {
        case (id, "HashAggregate", b) =>
          b.contains("c#") && exchangeIds.contains(id + 1)
        case _ => false
      }
      assert(partialBelowShuffle, s"$q\n$p")
    }
  }

  test("sorted-neighborhood rank never plans a single-partition global window") {
    // the naive row_number() OVER (ORDER BY name) would exchange the
    // whole relation to ONE task (Exchange SinglePartition) — the
    // distributed rank (range partition + offset broadcast + pid-local
    // window) must keep every exchange partitioned
    val p = plan("q_dedup_sorted_block")
    assert(!p.contains("SinglePartition"), p)
    assert(p.contains("Window"), p) // the pid-local window is still there
    // the incremental rank-merge face must hold the same guarantee: the
    // touched-pid local windows and the banded join never serialize
    val pi = plan("q_dedup_sorted_block_inc")
    assert(!pi.contains("SinglePartition"), pi)
  }

  test("metadata-only multimodal query prunes the binary payload derivation") {
    // the stand-in binarize derives metadata from text, so the scan reads
    // text — but the binary content column (encode(...)) must be pruned
    // out of the plan entirely
    val p = plan("q_multimodal_meta")
    assert(!p.toLowerCase.contains("encode("), p)
  }
}
