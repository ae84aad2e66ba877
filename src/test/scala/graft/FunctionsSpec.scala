package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.pipeline.{Similarity, TextAnalysis, TextHash}

/** Equivalence proofs: each custom Catalyst expression must produce exactly
  * the values of the HOF-expression formulation it replaced (which is what
  * the DuckDB oracle mirrors). Run over real testdata so the corpus edge
  * cases (empty-ish docs, repeated words) are covered.
  */
class FunctionsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
  private lazy val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  private def assertNoDiff(dfPair: org.apache.spark.sql.DataFrame): Unit = {
    val d = dfPair.filter(col("a") =!= col("b") ||
      (col("a").isNull && col("b").isNotNull) || (col("a").isNotNull && col("b").isNull))
    assert(d.isEmpty, d.limit(3).collect().mkString("; "))
  }

  test("TextFeaturesExpr == HOF featurizer on the corpus (bitwise, every dim)") {
    val kernel = TextAnalysis.featurize(docs).withColumnRenamed("embedding", "ka")
    val hof = TextAnalysis.featurizeHof(docs).withColumnRenamed("embedding", "hb")
    val joined = kernel.join(hof, "doc_id")
    for (d <- 0 until 16) {
      assertNoDiff(joined.select(
        element_at(col("ka"), d + 1).as("a"),
        element_at(col("hb"), d + 1).as("b")))
    }
  }

  test("PolyHashExpr == HOF polyhash on the corpus") {
    assertNoDiff(docs.select(
      GraftFunctions.polyHash(trim(col("text"))).as("a"),
      expr(TextHash.polyHashSpark("trim(text)")).as("b")))
  }

  test("PolyHash2Expr == HOF polyhash2 on the corpus and edge inputs") {
    import spark.implicits._
    assertNoDiff(docs.select(
      GraftFunctions.polyHash2(trim(col("text"))).as("a"),
      expr(TextHash.polyHash2Spark("trim(text)")).as("b")))
    val edge = Seq("", " ", "a", "ünïcödé wörds hére", "x " * 500).toDF("text")
    assertNoDiff(edge.select(
      GraftFunctions.polyHash2(col("text")).as("a"),
      expr(TextHash.polyHash2Spark("text")).as("b")))
    // independence sanity: the two folds disagree on real text
    val both = docs.limit(50).select(
      GraftFunctions.polyHash(col("text")).as("h1"),
      GraftFunctions.polyHash2(col("text")).as("h2"))
    assert(both.filter(col("h1") === col("h2")).isEmpty)
  }

  test("ShingleHashesExpr == HOF shingle hashes") {
    assertNoDiff(docs
      .withColumn("ws", expr(TextHash.wordsSpark("text")))
      .filter(size(col("ws")) >= 3)
      .select(
        GraftFunctions.shingleHashes(col("text")).as("a"),
        expr(TextHash.shingleHashesSpark("ws")).as("b")))
  }

  test("GramKeysExpr == HOF gram keys on the corpus (k=8 and k=3, edges)") {
    import spark.implicits._
    for (k <- Seq(8, 3)) {
      assertNoDiff(docs
        .withColumn("wh1", expr(TextHash.wordPolyHashesSpark(TextHash.wordsSpark("text"))))
        .withColumn("wh2", expr(TextHash.wordPolyHashes2Spark(TextHash.wordsSpark("text"))))
        .select(
          GraftFunctions.gramKeys(col("text"), k).as("a"),
          expr(TextHash.gramKeysSpark("wh1", "wh2", k)).as("b")))
    }
    // short/degenerate docs: below k words both sides yield empty arrays
    val edge = Seq("", " ", "a", "a b c d e f g", "a  b").toDF("text")
    assertNoDiff(edge
      .withColumn("wh1", expr(TextHash.wordPolyHashesSpark(TextHash.wordsSpark("text"))))
      .withColumn("wh2", expr(TextHash.wordPolyHashes2Spark(TextHash.wordsSpark("text"))))
      .select(
        GraftFunctions.gramKeys(col("text"), 8).as("a"),
        expr(TextHash.gramKeysSpark("wh1", "wh2", 8)).as("b")))
  }

  test("WinnowSelectExpr == composed HOF winnow (corpus + edges)") {
    import spark.implicits._
    def twin(df: org.apache.spark.sql.DataFrame, k: Int, w: Int) = df
      .withColumn("wh1", expr(TextHash.wordPolyHashesSpark(TextHash.wordsSpark("text"))))
      .withColumn("g", expr(TextHash.winnowGramsSpark("wh1", k)))
      // materialization barrier: winnowSelectSpark references g once per
      // window element — projection collapse would inline the whole gram
      // transform into every reference (quadratic HOF re-evaluation; the
      // oracle's MATERIALIZED CTE is the same barrier on the DuckDB side)
      .localCheckpoint()
      .select(
        GraftFunctions.winnowSelect(col("text"), k, w).as("a"),
        expr(TextHash.winnowSelectSpark("g", w)).as("b"))
    for ((k, w) <- Seq((3, 4), (8, 6), (3, 1))) assertNoDiff(twin(docs, k, w))
    // edges: empty/blank/sub-k docs (both empty), grams < w (global min)
    val edge = Seq("", " ", "a", "a b", "a b c", "a b c d e", "a  b  c").toDF("text")
    assertNoDiff(twin(edge, 3, 4))
  }

  test("MinHashSigExpr == HOF minhash") {
    assertNoDiff(docs
      .withColumn("ws", expr(TextHash.wordsSpark("text")))
      .filter(size(col("ws")) >= 3)
      .withColumn("hs", expr(TextHash.shingleHashesSpark("ws")))
      .select(
        GraftFunctions.minHashSig(col("hs")).as("a"),
        expr(TextHash.minhashSpark("hs")).as("b")))
  }

  test("SimHashExpr == HOF simhash") {
    assertNoDiff(docs
      .withColumn("ws", expr(TextHash.wordsSpark("text")))
      .withColumn("wh", expr(TextHash.wordHashesSpark("ws")))
      .select(
        GraftFunctions.simHash(col("text")).as("a"),
        expr(TextHash.simhashSpark("wh")).as("b")))
  }

  test("BigramStatsExpr == HOF gram stats on the corpus") {
    val gs = TextAnalysis.bigramGramsHof(TextHash.wordsSpark("text"))
    assertNoDiff(docs.select(
      GraftFunctions.bigramStats(col("text")).as("a"),
      array(size(expr(gs)).cast("long"),
        size(array_distinct(expr(gs))).cast("long"),
        expr(TextAnalysis.topRunHof(gs)).cast("long")).as("b")))
  }

  test("JaccardExpr == HOF jaccard on cross-doc shingle pairs (bitwise)") {
    val hs = docs
      .withColumn("ws", expr(TextHash.wordsSpark("text")))
      .filter(size(col("ws")) >= 3)
      .select(expr(TextHash.shingleHashesSpark("ws")).as("hs"))
    assertNoDiff(hs.limit(100).select(col("hs").as("ha"))
      .crossJoin(hs.limit(5).select(col("hs").as("hb")))
      .select(
        GraftFunctions.jaccard(col("ha"), col("hb")).as("a"),
        expr(TextHash.jaccardSpark("ha", "hb")).as("b")))
  }

  test("DotProductExpr == HOF sequential fold (bitwise)") {
    assertNoDiff(emb.limit(200).select(col("embedding").as("v"))
      .crossJoin(emb.limit(5).select(col("embedding").as("w")))
      .select(
        GraftFunctions.dotProduct(col("v"), col("w")).as("a"),
        expr(Similarity.dotSpark("v", "w")).as("b")))
  }

  test("HyperplaneBitsExpr band slices == HOF bucket keys") {
    val withBits = emb.select(col("embedding"),
      GraftFunctions.hyperplaneBits(col("embedding")).as("bits"))
    for (b <- 0 until Similarity.HpBands) {
      assertNoDiff(withBits.select(
        (shiftright(col("bits"), b * Similarity.HpBandBits) % (1 << Similarity.HpBandBits))
          .cast("long").as("a"),
        expr(Similarity.bucketKeySpark("embedding", b, 64)).cast("long").as("b")))
    }
  }

  test("NearDupKeysExpr band elements == HOF near-dup keys") {
    val withKeys = emb.select(col("embedding"),
      GraftFunctions.nearDupKeys(col("embedding")).as("keys"))
    for (b <- 0 until Similarity.NdBands) {
      assertNoDiff(withKeys.select(
        element_at(col("keys"), b + 1).cast("long").as("a"),
        expr(Similarity.ndKeySpark("embedding", b)).cast("long").as("b")))
    }
  }

  test("near-dup bucket key width follows corpus size through the mask ladder") {
    import spark.implicits._
    def synth(n: Int) = (1 to n).map(i => (i.toLong,
      Array.tabulate(8)(d => ((i * 31 + d * 17) % 13 - 6).toFloat))).toDF("vec_id", "embedding")
    // 100 vecs <= 64<<4: narrowest (4-bit) keys — buckets stay populated
    val smallMax = Similarity.ndBuckets(synth(100)).agg(max("key")).first().getLong(0)
    assert(smallMax <= 15, s"4-bit mask expected at n=100, max key $smallMax")
    // 5000 vecs: ladder steps to 7 bits (first b with 5000 <= 64<<b)
    val largeMax = Similarity.ndBuckets(synth(5000)).agg(max("key")).first().getLong(0)
    assert(largeMax > 15 && largeMax <= 127,
      s"7-bit mask expected at n=5000, max key $largeMax")
  }

  test("text kernels == HOF forms on adversarial edge inputs") {
    import spark.implicits._
    val edge = Seq("", " ", "  ", "a", "a b", "a b c", "a  b", "x " * 500,
      "tab\tand\nnewline", "ünïcödé wörds hére", "a b c d e f g h")
      .toDF("text")
    assertNoDiff(edge.select(
      GraftFunctions.polyHash(col("text")).as("a"),
      expr(graft.pipeline.TextHash.polyHashSpark("text")).as("b")))
    assertNoDiff(edge.select(
      GraftFunctions.shingleHashes(col("text")).as("a"),
      expr(graft.pipeline.TextHash.shingleHashesSpark(
        graft.pipeline.TextHash.wordsSpark("text"))).as("b")))
    assertNoDiff(edge.select(
      GraftFunctions.simHash(col("text")).as("a"),
      expr(graft.pipeline.TextHash.simhashSpark(
        graft.pipeline.TextHash.wordHashesSpark(
          graft.pipeline.TextHash.wordsSpark("text")))).as("b")))
  }

  test("SQL registration via GraftExtensions") {
    graft.functions.GraftExtensions.installInto(spark)
    val r = spark.sql("SELECT graft_polyhash('abc') AS h, graft_simhash('a b c') AS s").first()
    assert(r.getLong(0) == graft.functions.TextHashImpl.polyHash("abc"))
    assert(r.getLong(1) == graft.functions.TextHashImpl.simHash(
      graft.functions.TextHashImpl.wordHashes("a b c")))
  }
}
