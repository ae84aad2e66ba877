package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering the graft expressions as SQL
  * functions, so `spark.sql("SELECT graft_polyhash(text) ...")` works in
  * addition to the Column API. Install with
  * `SparkSession.builder.withExtensions(new GraftExtensions)`, via
  * `spark.sql.extensions=graft.functions.GraftExtensions`, or into an
  * already-running session with `GraftExtensions.installInto(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.JaccardPrefilter)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def fn(name: String, usage: String, arity: Int)(
      build: Seq[Expression] => Expression):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name, usage), (args: Seq[Expression]) => {
      require(args.length == arity, s"$name expects $arity argument(s), got ${args.length}")
      build(args)
    })

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("graft_polyhash", "polynomial codepoint hash mod 1e9+7", 1)(a => PolyHashExpr(a.head)),
    fn("graft_polyhash2", "independent polynomial codepoint hash mod 998244353", 1)(a => PolyHash2Expr(a.head)),
    fn("graft_shingle_hashes", "distinct 3-word-shingle hashes", 1)(a => ShingleHashesExpr(a.head)),
    fn("graft_simhash", "48-bit word-multiset simhash", 1)(a => SimHashExpr(a.head)),
    fn("graft_minhash", "16-permutation minhash signature of a hash array", 1)(a => MinHashSigExpr(a.head)),
    fn("graft_dot", "sequential-fold double dot product of float arrays", 2)(a => DotProductExpr(a(0), a(1))),
    fn("graft_hyperplane_bits", "packed LSH hyperplane sign bits", 1)(a => HyperplaneBitsExpr(a.head)),
    fn("graft_jaccard", "Jaccard similarity of distinct-hash arrays", 2)(a => JaccardExpr(a(0), a(1))),
    fn("graft_bigram_stats", "[n, n_uniq, top] word-bigram repetition stats", 1)(a => BigramStatsExpr(a.head)),
    fn("graft_neardup_keys", "per-band full-width near-dup bucket keys", 1)(a => NearDupKeysExpr(a.head)),
    fn("graft_gram_keys", "per-position k-word gram keys (exact-substring dedup seeds)", 2)(a => {
      val k = a(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"graft_gram_keys: k must be an INT literal, got $other")
      }
      GramKeysExpr(a(0), k)
    }),
  )

  /** Register into a live session (the extensions path only applies at
    * session construction). */
  def installInto(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (id, inf, builder) => reg.registerFunction(id, inf, builder) }
  }
}
