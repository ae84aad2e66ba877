package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: the `row_number() <= k` top-k-per-key idiom becomes the
  * sort-free heap operator ([[TopKPerKeyNode]]).
  *
  * Users write the universal SQL shape —
  * `withColumn("rn", row_number().over(W.partitionBy(p).orderBy(o)))
  * .filter(rn <= k).drop("rn")` — whose plan sorts every key's FULL row
  * set just to discard everything past rank k. Spark's own
  * InferWindowGroupLimit only bounds that sort's input (per-partition
  * group limit, sort retained); this rewrite removes the Window and its
  * sort entirely: bounded per-key heaps, partial pass under the exchange,
  * shuffle capped at k rows/key/partition ([[TopKPerKeyExec]]).
  *
  * Fires ONLY when:
  *  - the Window computes exactly one expression, a `row_number()` over a
  *    non-empty partitionSpec with a non-empty orderSpec;
  *  - the filter bounds it from above (`rn <= k`, `rn < k`, `rn = 1`) —
  *    pagination shapes (`rn >= 2`) and rank-slice shapes (`rn = 3`) are
  *    left alone;
  *  - the projection above DROPS the row number, so no operator upstream
  *    can observe the ranks (the heap emits rows unranked and unordered);
  *  - k <= MaxRewriteK — the heap holds k rows per key per partition
  *    on-heap with no spill path, so an unbounded k must stay with the
  *    spilling window sort (operator memory contract, TopKPerKey.scala).
  *
  * Semantics: identical row set. Under a non-total orderSpec both
  * formulations are tie-nondeterministic (Spark's window makes no tie
  * promise either); every catalog query supplies a total order. Rows
  * whose non-rank filter conjuncts remain are filtered ABOVE the top-k,
  * exactly where the original filter sat relative to the ranking.
  *
  * In-catalog effect (all three rewritten sites are `rn = 1`, the
  * operator's best regime): q_events_latest, q_agg_mode's per-group
  * argmax, q_prep_training's fingerprint dedup step. The tf-idf-style
  * queries that keep `rn` in their output are untouched by construction.
  *
  * Register together with [[TopKPerKeyStrategy]] (GraftExtensions injects
  * both); the node cannot plan without the strategy. Kill switch:
  * `spark.graft.windowTopKRewrite=false`.
  *
  * Huge-cardinality memory regime (groups ≈ rows): MaxRewriteK bounds k
  * but not the per-partition DISTINCT-KEY count, so a near-unique key
  * would make the heap map buffer roughly the whole partition on-heap
  * with no spill path, where the window sort it replaced would have
  * spilled (TopKPerKey.scala's memory contract spells the same bound out
  * operator-side). Guarded two ways:
  *  - stats-based skip: when CBO column statistics are available for
  *    every partition-key attribute (ANALYZE TABLE ... FOR COLUMNS +
  *    spark.sql.cbo.enabled), the rule estimates the worst-case heap-map
  *    footprint — ndv(keys) · k · avg-row-width, one task seeing every
  *    key — and leaves the window plan alone past
  *    `spark.graft.windowTopKRewrite.heapBudgetBytes` (default 256 MiB,
  *    sized to stay a small fraction of a typical executor's on-heap
  *    share). No stats (the parquet-scan default) → rewrite, the status
  *    quo: cardinality is then a runtime property the optimizer cannot
  *    see, and the kill switch remains the escape hatch.
  *  - kill switch: `spark.graft.windowTopKRewrite=false`.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** memory-contract bound: past this, the spilling window sort is the
    * right plan even when the pattern matches */
  val MaxRewriteK = 10000

  /** default worst-case heap-map budget for the stats-based skip */
  val DefaultHeapBudgetBytes: Long = 256L << 20

  /** Stats-based huge-cardinality guard: false only when column stats
    * PROVE the heap map would outgrow the budget — ndv·k·rowWidth, the
    * worst case of one task's partial pass seeing every key. Missing
    * stats (any partition key without a distinctCount, or non-attribute
    * key expressions) allow the rewrite: the estimate errs toward the
    * established behavior, never toward a silent plan change on
    * stats-less inputs. */
  private def heapFitsBudget(
      child: LogicalPlan, partitionSpec: Seq[Expression], k: Int): Boolean = {
    // fail-open on a malformed user-set value (matching the rule's
    // conservative posture) rather than surfacing NumberFormatException as
    // an opaque planner stack trace
    val budget = scala.util.Try(conf.getConfString(
      "spark.graft.windowTopKRewrite.heapBudgetBytes",
      DefaultHeapBudgetBytes.toString).toLong).getOrElse(DefaultHeapBudgetBytes)
    val stats = child.stats
    val attrs = partitionSpec.collect { case a: Attribute => a }
    if (attrs.size != partitionSpec.size) return true
    val ndvs = attrs.map(a => stats.attributeStats.get(a).flatMap(_.distinctCount))
    if (ndvs.exists(_.isEmpty)) return true
    // composite-key ndv: capped product (independence upper bound), never
    // above the row count when that is known
    val product = ndvs.flatten.product
    val ndv = stats.rowCount.filter(_ > 0).map(product.min).getOrElse(product)
    val rowWidth = stats.rowCount.filter(_ > 0)
      .map(rc => (stats.sizeInBytes / rc).max(BigInt(16)))
      .getOrElse(BigInt(64))
    ndv * k * rowWidth <= budget
  }

  /** upper bound k implied by one rn-predicate, if it is one of the
    * bounded-from-above forms */
  private def boundOf(e: Expression, rn: ExprId): Option[Int] = e match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.exprId == rn => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.exprId == rn => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.exprId == rn => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.exprId == rn => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.exprId == rn => Some(1)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.exprId == rn => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.windowTopKRewrite", "true") != "true") return plan
    plan.transform {
      case p @ Project(projectList,
          Filter(cond,
            Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
              partitionSpec, orderSpec, windowChild, _)))
          if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
        val rnId = alias.exprId
        val usesRn = projectList.exists(_.references.exists(_.exprId == rnId))
        val (rnPreds, rest) =
          splitConjunctivePredicates(cond).partition(_.references.exists(_.exprId == rnId))
        val bounds = rnPreds.map(boundOf(_, rnId))
        if (usesRn || rnPreds.isEmpty || bounds.contains(None)) p
        else {
          val k = bounds.flatten.min
          // InferWindowGroupLimit (main optimizer batches, before this
          // rule) usually sits underneath by now; strip it — the heap
          // operator subsumes the group limit. Only a row_number() limit
          // of at least k is subsumable: a rank()-based or tighter limit
          // admits a different row set than the heap would rebuild, so
          // anything else stays in place (the heap on top is then merely
          // redundant, never wrong). Stripping FIRST also matters for the
          // stats guard: the stats visitor doesn't propagate column stats
          // through WindowGroupLimit (attributeStats would read empty and
          // the guard would silently fall into its missing-stats branch).
          val child = windowChild match {
            case WindowGroupLimit(ps, os, RowNumber(), limit, c)
                if ps == partitionSpec && os == orderSpec && limit >= k => c
            case c => c
          }
          if (k <= 0 || k > MaxRewriteK || !heapFitsBudget(child, partitionSpec, k)) p
          else {
            val topk = TopKPerKeyNode(partitionSpec, orderSpec, k, child)
            val body = if (rest.isEmpty) topk else Filter(rest.reduce(And), topk)
            Project(projectList, body)
          }
        }
    }
  }
}
