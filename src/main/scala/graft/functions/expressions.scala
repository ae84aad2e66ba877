package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot hash/vector kernels.
  *
  * Why expressions and not SQL higher-order functions: the HOF
  * formulations (aggregate/transform lambdas) allocate intermediate arrays
  * per row and explode whole-stage-codegen size (48 folds for simhash);
  * why expressions and not UDFs: these stay inside codegen — each compiles
  * to a single static JVM call, no Scala-function SerDe, null handling via
  * nullSafeCodeGen. Semantics are identical to the HOF/DuckDB versions
  * (FunctionsSpec proves equivalence), so the oracle contract is unchanged.
  */

/** string -> long: polynomial codepoint hash mod TextHash.P */
case class PolyHashExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.polyHash(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashImpl.polyHash($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_polyhash"
}

/** string -> long: second independent polynomial hash mod TextHash.P2
  * (128-bit fingerprinting's low half) */
case class PolyHash2Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.polyHash2(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashImpl.polyHash2($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): PolyHash2Expr =
    copy(child = newChild)
  override def prettyName: String = "graft_polyhash2"
}

/** string -> array<long>: distinct 3-word-shingle hashes */
case class ShingleHashesExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHashImpl.shingleHashes(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.TextHashImpl.shingleHashes($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_hashes"
}

/** string -> long: SimBits-bit simhash of the word multiset */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.simHash(TextHashImpl.wordHashes(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashImpl.simHash(graft.functions.TextHashImpl.wordHashes($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash"
}

/** array<long> -> array<long>: minhash signature. Entries are null for an
  * empty input set (HOF/DuckDB array_min-of-empty semantics — enforced by
  * FunctionsFuzzSpec), hence containsNull = true. */
case class MinHashSigExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects ARRAY<BIGINT>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.minHashOrNulls(input.asInstanceOf[ArrayData].toLongArray())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashImpl.minHashOrNulls($c.toLongArray())")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash"
}

/** (array<float>, array<float>) -> double: sequential-fold dot product */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"$prettyName expects ARRAY<FLOAT> args, got $l, $r")
  }
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecImpl.dot(a.asInstanceOf[ArrayData].toFloatArray(), b.asInstanceOf[ArrayData].toFloatArray())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecImpl.dot($a.toFloatArray(), $b.toFloatArray())")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot"
}

/** array<float> -> long: packed hyperplane sign bits (LSH bucket source) */
case class HyperplaneBitsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects ARRAY<FLOAT>, got $t")
  }
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    VecImpl.hyperplaneBits(input.asInstanceOf[ArrayData].toFloatArray())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecImpl.hyperplaneBits($c.toFloatArray())")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBitsExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_hyperplane_bits"
}

/** array<float> -> array<bigint>: per-band full-width near-dup bucket keys
  * (coef2 hyperplane family; element b = band b's NdMaxBits-bit key).
  * Callers mask keys to the corpus-size-adaptive width. Bit-equivalence
  * with the HOF twin (Similarity.ndKeySpark) is enforced by FunctionsSpec. */
case class NearDupKeysExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects ARRAY<FLOAT>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(VecImpl.nearDupKeys(input.asInstanceOf[ArrayData].toFloatArray()))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.VecImpl.nearDupKeys($c.toFloatArray()))")
  override protected def withNewChildInternal(newChild: Expression): NearDupKeysExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_neardup_keys"
}

/** string -> array<bigint> [n_grams, n_uniq_grams, top_gram_n]: word-bigram
  * repetition statistics in one tokenize + one hash-count pass. Replaces
  * the HOF formulation (array_sort + run fold), which allocates the gram
  * array twice per row and evaluates lambdas interpreted; bit-equivalence
  * with the HOF twin is enforced by FunctionsSpec/FunctionsFuzzSpec. */
case class BigramStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHashImpl.bigramStats(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.TextHashImpl.bigramStats($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): BigramStatsExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_bigram_stats"
}

/** (array<long>, array<long>) -> double: Jaccard of distinct-hash sets.
  * Replaces the HOF form (CAST(size(array_intersect(a,b))...) in the dedup
  * verify stage — the HOF evaluates array_intersect TWICE per row and
  * allocates the intersection array both times; this is one codegen'd
  * static call with a two-pointer count. Bit-identical (FunctionsSpec). */
case class JaccardExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"$prettyName expects ARRAY<BIGINT> args, got $l, $r")
  }
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHashImpl.jaccard(a.asInstanceOf[ArrayData].toLongArray(), b.asInstanceOf[ArrayData].toLongArray())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHashImpl.jaccard($a.toLongArray(), $b.toLongArray())")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_jaccard"
}

/** long -> boolean: membership probe against a pre-built bloom filter
  * (`org.apache.spark.util.sketch.BloomFilter`, Spark's public sketch API —
  * serializable, so the filter ships once per executor inside the codegen
  * references array, not per row). No false negatives, so filtering with
  * this before an exact anti-join is exactness-preserving (`ops.BloomPrune`).
  * Not part of the FunctionsSpec bit-equivalence family: it has no HOF/
  * DuckDB twin — correctness is result-set equality with the unfiltered
  * join (ScaleOpsSpec) and the unchanged q_dedup_final oracle. */
case class BloomMightContainExpr(child: Expression,
    filter: org.apache.spark.util.sketch.BloomFilter) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects BIGINT, got ${child.dataType}")
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloom", filter,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bf.mightContainLong($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_bloom_might_contain"
}

/** long -> long: frequency estimate from a pre-built count-min sketch
  * (`org.apache.spark.util.sketch.CountMinSketch`, Spark's public sketch
  * API — ships once per executor via the codegen references array). CMS
  * never underestimates, so thresholding on this before an exact recount
  * is exactness-preserving (`ops.HeavyHitters`). Like the bloom probe, not
  * in the FunctionsSpec bit-equivalence family (no DuckDB twin) —
  * correctness is result equality with the unpruned aggregation. */
case class CountMinEstimateExpr(child: Expression,
    sketch: org.apache.spark.util.sketch.CountMinSketch) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects BIGINT, got ${child.dataType}")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    sketch.estimateCount(Long.box(input.asInstanceOf[Long]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cms = ctx.addReferenceObj("graftCms", sketch,
      classOf[org.apache.spark.util.sketch.CountMinSketch].getName)
    defineCodeGen(ctx, ev, c => s"$cms.estimateCount((Object) java.lang.Long.valueOf($c))")
  }
  override protected def withNewChildInternal(newChild: Expression): CountMinEstimateExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_cms_estimate"
}

/** Column-API entry points (the library surface). */
/** string -> array<float>: dim hash-projection text features (the
  * documents→vectors featurizer kernel; TextAnalysis.featurize docs the
  * arithmetic, FunctionsSpec pins bit-equivalence to the HOF twin) */
case class TextFeaturesExpr(child: Expression, dim: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHashImpl.textFeatures(input.asInstanceOf[UTF8String].toString, dim))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.TextHashImpl.textFeatures($c.toString(), $dim))")
  override protected def withNewChildInternal(newChild: Expression): TextFeaturesExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_text_features"
}

/** string -> array<long>: per-position k-word gram keys (exact-substring
  * dedup seeds; TextHash.gramKeysSpark documents the double-fold
  * arithmetic, FunctionsSpec pins bit-equivalence to the HOF twin) */
case class GramKeysExpr(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHashImpl.gramKeys(input.asInstanceOf[UTF8String].toString, k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.TextHashImpl.gramKeys($c.toString(), $k))")
  override protected def withNewChildInternal(newChild: Expression): GramKeysExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_gram_keys"
}

/** string -> array<long>: winnow-selected fingerprint hashes (robust
  * winnowing; TextHash.winnowGramsSpark/winnowSelectSpark document the
  * packed-key window-min arithmetic, FunctionsSpec pins bit-equivalence
  * to the composed HOF twin) */
case class WinnowSelectExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHashImpl.winnowSelect(input.asInstanceOf[UTF8String].toString, k, w))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.TextHashImpl.winnowSelect($c.toString(), $k, $w))")
  override protected def withNewChildInternal(newChild: Expression): WinnowSelectExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_winnow_select"
}

object GraftFunctions {
  private def c(e: Expression): Column = org.apache.spark.sql.GraftBridge.column(e)
  private def ex(col: Column): Expression = org.apache.spark.sql.GraftBridge.expression(col)

  def polyHash(col: Column): Column = c(PolyHashExpr(ex(col)))
  def polyHash2(col: Column): Column = c(PolyHash2Expr(ex(col)))
  def shingleHashes(col: Column): Column = c(ShingleHashesExpr(ex(col)))
  def simHash(col: Column): Column = c(SimHashExpr(ex(col)))
  def minHashSig(col: Column): Column = c(MinHashSigExpr(ex(col)))
  def dotProduct(a: Column, b: Column): Column = c(DotProductExpr(ex(a), ex(b)))
  def vecNorm(a: Column): Column = org.apache.spark.sql.functions.sqrt(dotProduct(a, a))
  def hyperplaneBits(col: Column): Column = c(HyperplaneBitsExpr(ex(col)))
  def nearDupKeys(col: Column): Column = c(NearDupKeysExpr(ex(col)))
  def bloomMightContain(col: Column, filter: org.apache.spark.util.sketch.BloomFilter): Column =
    c(BloomMightContainExpr(ex(col), filter))
  def cmsEstimate(col: Column, sketch: org.apache.spark.util.sketch.CountMinSketch): Column =
    c(CountMinEstimateExpr(ex(col), sketch))
  def jaccard(a: Column, b: Column): Column = c(JaccardExpr(ex(a), ex(b)))
  def bigramStats(col: Column): Column = c(BigramStatsExpr(ex(col)))
  def textFeatures(col: Column, dim: Int): Column = c(TextFeaturesExpr(ex(col), dim))
  def gramKeys(col: Column, k: Int): Column = c(GramKeysExpr(ex(col), k))
  def winnowSelect(col: Column, k: Int, w: Int): Column = c(WinnowSelectExpr(ex(col), k, w))
}
