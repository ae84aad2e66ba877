package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{ProductQuant, Similarity, VecKMeans}

class VecKMeansSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(sf("sf0.01") + "/embeddings.parquet")

  test("vector k-means: SSE decreases from seed to trained centroids") {
    val seeds = emb.orderBy("vec_id").limit(8)
      .select("embedding").as[Array[Float]].collect().map(_.map(_.toDouble))
    val trained = VecKMeans.train(emb, k = 8, iterations = 5)
    assert(VecKMeans.sse(emb, trained) < VecKMeans.sse(emb, seeds))
  }

  test("assignment is deterministic and total") {
    val cents = VecKMeans.train(emb, k = 4, iterations = 2)
    val a1 = VecKMeans.assign(emb, cents).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = VecKMeans.assign(emb, cents).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 == a2)
    assert(a1.size == emb.count())
    assert(a1.values.toSet.subsetOf((0 until 4).toSet))
  }

  test("IVF top-k achieves reasonable recall vs brute force at a fraction of the scan") {
    val queries = emb.filter(col("vec_id") < 8)
    val cents = VecKMeans.train(emb, k = 8, iterations = 3)
    val ivf = VecKMeans.ivfTopK(emb, queries, cents, k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    info(f"IVF recall@5 with nprobe=3/8 cells: $recall%.2f")
    assert(recall >= 0.5, s"recall $recall too low")
    // scanning 3 of 8 cells must not return more than k rows per query
    assert(ivf.size <= 8 * 5)
  }

  test("PQ ADC top-k achieves reasonable recall vs brute force on 32x-compressed codes") {
    val queries = emb.filter(col("vec_id") < 8)
    val cb = ProductQuant.train(emb, iterations = 3)
    val pq = ProductQuant.adcTopK(emb, queries, cb, k = 5, refine = 25)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = pq.intersect(exact).size.toDouble / exact.size
    info(f"PQ recall@5 (M=${ProductQuant.M}, ksub=${ProductQuant.KSub}, refine=25): $recall%.2f")
    assert(recall >= 0.5, s"recall $recall too low")
    assert(pq.size <= 8 * 5)
    // deterministic: a second run reproduces the result exactly
    val again = ProductQuant.adcTopK(emb, queries, cb, k = 5, refine = 25)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again == pq)
  }

  test("IVF+PQ composite: candidates respect the probed-cell restriction, recall measured") {
    val queries = emb.filter(col("vec_id") < 8)
    val cents = VecKMeans.train(emb, k = 8, iterations = 3)
    val cb = ProductQuant.train(emb, iterations = 3)
    val ivfpq = ProductQuant.ivfpqTopK(emb, queries, cents, cb, k = 5, nprobe = 3, refine = 25)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = ivfpq.intersect(exact).size.toDouble / exact.size
    info(f"IVF+PQ recall@5 (nprobe=3/8 cells, refine=25): $recall%.2f")
    assert(recall >= 0.4, s"recall $recall too low")
    assert(ivfpq.size <= 8 * 5)

    // every returned neighbor lies in one of its query's probed cells —
    // the IVF restriction is real, not advisory
    val cellOf = VecKMeans.assign(emb, cents).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probedOf = queries.select("vec_id", "embedding").collect().map { r =>
      val qv = r.getSeq[Float](1).toArray
      val byDist = cents.indices.sortBy { c =>
        var acc = 0.0; var i = 0
        while (i < qv.length) { val d = qv(i) - cents(c)(i); acc += d * d; i += 1 }
        acc
      }
      r.getLong(0) -> byDist.take(3).toSet
    }.toMap
    ivfpq.foreach { case (qid, nid) =>
      assert(probedOf(qid).contains(cellOf(nid)),
        s"neighbor $nid of query $qid came from unprobed cell ${cellOf(nid)}")
    }

    // deterministic: a second run reproduces the result exactly
    val again = ProductQuant.ivfpqTopK(emb, queries, cents, cb, k = 5, nprobe = 3, refine = 25)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again == ivfpq)
  }

  test("LSH top-k achieves reasonable recall vs brute force on bucket-local scans") {
    val queries = emb.filter(col("vec_id") < 8)
    val lsh = Similarity.lshTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    info(f"LSH recall@5 with ${Similarity.HpBands} bands x ${Similarity.HpBandBits} bits: $recall%.2f")
    assert(recall >= 0.5, s"recall $recall too low")
    assert(lsh.size <= 8 * 5)

    // multiprobe supersets single-probe candidates, so recall never drops
    val mp = Similarity.lshTopKMultiprobe(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val mpRecall = mp.intersect(exact).size.toDouble / exact.size
    info(f"multiprobe recall@5: $mpRecall%.2f")
    assert(mpRecall >= recall)
  }
}
