package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.pipeline.{Similarity, TextAnalysis, TextHash}

/** Seeded fuzz twin of FunctionsSpec: the corpus equivalence tests run on
  * realistic documents, so they never see the degenerate shapes — empty
  * strings, all-separator strings, fewer than 3 words, repeated runs of
  * spaces — where a kernel and its HOF formulation could diverge on guard
  * logic. 1,000 adversarial strings (fixed seed, reproducible), compared
  * UNGUARDED: every expression must equal its HOF twin on every input.
  */
class FunctionsFuzzSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fuzzDocs = {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab cd!? e,.0 12  x" // letters, digits, punct, space runs
    val strs = (1 to 1000).map { i =>
      val len = rnd.nextInt(40)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    strs.toDF("doc_id", "text").persist()
  }

  private lazy val fuzzVecs = {
    val rnd = new scala.util.Random(43)
    (1 to 300).map { i =>
      (i.toLong, Array.fill(16)((rnd.nextFloat() - 0.5f) * 4f))
    }.toDF("vec_id", "embedding").persist()
  }

  private def assertNoDiff(dfPair: org.apache.spark.sql.DataFrame): Unit = {
    val d = dfPair.filter(col("a") =!= col("b") ||
      (col("a").isNull && col("b").isNotNull) || (col("a").isNotNull && col("b").isNull))
    assert(d.isEmpty, d.limit(3).collect().mkString("; "))
  }

  test("polyhash: expression == HOF on degenerate strings (empty, space runs)") {
    assertNoDiff(fuzzDocs.select(
      GraftFunctions.polyHash(trim(col("text"))).as("a"),
      expr(TextHash.polyHashSpark("trim(text)")).as("b")))
  }

  test("shingle hashes: expression == HOF unguarded (short docs -> empty set)") {
    assertNoDiff(fuzzDocs.select(
      GraftFunctions.shingleHashes(col("text")).as("a"),
      expr(TextHash.shingleHashesSpark(TextHash.wordsSpark("text"))).as("b")))
  }

  test("simhash: expression == HOF unguarded") {
    assertNoDiff(fuzzDocs.select(
      GraftFunctions.simHash(col("text")).as("a"),
      expr(TextHash.simhashSpark(TextHash.wordHashesSpark(TextHash.wordsSpark("text")))).as("b")))
  }

  test("bigram stats: expression == HOF unguarded (empty, <2 words, space runs)") {
    val gs = TextAnalysis.bigramGramsHof(TextHash.wordsSpark("text"))
    assertNoDiff(fuzzDocs.select(
      GraftFunctions.bigramStats(col("text")).as("a"),
      array(size(expr(gs)).cast("long"),
        size(array_distinct(expr(gs))).cast("long"),
        expr(TextAnalysis.topRunHof(gs)).cast("long")).as("b")))
  }

  test("gram keys: expression == HOF unguarded (short docs -> empty array)") {
    for (k <- Seq(3, 8)) assertNoDiff(fuzzDocs
      .withColumn("wh1", expr(TextHash.wordPolyHashesSpark(TextHash.wordsSpark("text"))))
      .withColumn("wh2", expr(TextHash.wordPolyHashes2Spark(TextHash.wordsSpark("text"))))
      .select(
        GraftFunctions.gramKeys(col("text"), k).as("a"),
        expr(TextHash.gramKeysSpark("wh1", "wh2", k)).as("b")))
  }

  test("winnow select: expression == composed HOF on fuzz docs") {
    for ((k, w) <- Seq((3, 4), (5, 3))) assertNoDiff(fuzzDocs
      .withColumn("wh1", expr(TextHash.wordPolyHashesSpark(TextHash.wordsSpark("text"))))
      .withColumn("g", expr(TextHash.winnowGramsSpark("wh1", k)))
      .localCheckpoint() // barrier: see FunctionsSpec winnow twin note
      .select(
        GraftFunctions.winnowSelect(col("text"), k, w).as("a"),
        expr(TextHash.winnowSelectSpark("g", w)).as("b")))
  }

  test("minhash: expression == HOF on possibly-empty shingle sets") {
    assertNoDiff(fuzzDocs
      .withColumn("hs", GraftFunctions.shingleHashes(col("text")))
      .select(
        GraftFunctions.minHashSig(col("hs")).as("a"),
        expr(TextHash.minhashSpark("hs")).as("b")))
  }

  test("dot product and hyperplane bits: expression == HOF on signed random vectors") {
    assertNoDiff(fuzzVecs.select(
      GraftFunctions.dotProduct(col("embedding"), col("embedding")).as("a"),
      expr(Similarity.dotSpark("embedding", "embedding")).as("b")))
    assertNoDiff(fuzzVecs.select(
      GraftFunctions.hyperplaneBits(col("embedding")).as("a"),
      expr((0 until Similarity.NumHyperplanes).map { t =>
        s"IF(${Similarity.hyperplaneDotSpark("embedding", t, 16)} >= 0.0, ${1L << t}, 0)"
      }.mkString(" + ")).as("b")))
  }
}
