package graft.functions

import graft.pipeline.TextHash

/** JVM kernels behind the custom Catalyst expressions. Each computes
  * exactly the arithmetic of the TextHash/Similarity SQL formulations
  * (verified by equivalence tests in FunctionsSpec), in tight primitive
  * loops with zero intermediate allocation — the generated code is a single
  * static call, so whole-stage codegen stays small and Janino-fast while
  * the hot loop is JIT-compiled once.
  */
object TextHashImpl {
  import TextHash.{P, Spread}

  /** polynomial codepoint hash: fold (acc*31 + cp) % P — the kernel of
    * polyHashSpark/polyHashDuck */
  def polyHash(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** second independent polynomial hash: fold (acc*131 + cp) % P2 — the
    * kernel of polyHash2Spark/polyHash2Duck (128-bit fingerprinting) */
  def polyHash2(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 131 + cp) % TextHash.P2
      i += Character.charCount(cp)
    }
    acc
  }

  /** polyHash of words i..i+2 joined with ' ' — without building the
    * joined string */
  private def shingleHash(words: Array[String], i: Int): Long = {
    var acc = 0L
    var w = i
    while (w < i + 3) {
      if (w > i) acc = (acc * 31 + ' '.toInt) % P
      val s = words(w)
      var j = 0
      val n = s.length
      while (j < n) {
        val cp = s.codePointAt(j)
        acc = (acc * 31 + cp) % P
        j += Character.charCount(cp)
      }
      w += 1
    }
    acc
  }

  /** whitespace tokenization identical to split(trim(s), ' ') — single
    * spaces delimit; consecutive spaces yield empty tokens */
  def tokenize(s: String): Array[String] = s.trim.split(" ", -1)

  /** distinct 3-word-shingle hashes, order of first occurrence (set
    * semantics match array_distinct/list_distinct) */
  def shingleHashes(s: String): Array[Long] = {
    val words = tokenize(s)
    if (words.length < 3) return Array.emptyLongArray
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= words.length - 3) {
      out.add(shingleHash(words, i))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    arr
  }

  /** per-word spread hashes (multiset, order kept):
    * (polyHash(w) * Spread) mod 2^SimBits */
  def wordHashes(s: String): Array[Long] = {
    val words = tokenize(s)
    val mod = 1L << TextHash.SimBits
    val out = new Array[Long](words.length)
    var i = 0
    while (i < words.length) {
      out(i) = polyHash(words(i)) * Spread % mod
      i += 1
    }
    out
  }

  /** Per-position k-gram combined keys over the whitespace tokenization —
    * the kernel of TextHash.gramKeysSpark (exact-substring dedup): for
    * 1-based position i,
    *   g1 = fold (acc*31  + polyHash(w_j))  % P   over words i..i+k-1
    *   g2 = fold (acc*131 + polyHash2(w_j)) % P2
    *   key = g1 * P2 + g2.
    * Per-word hashes computed once (the HOF twin re-folds each word's
    * chars at every covering position); O(n·k) long ops after that. */
  def gramKeys(s: String, k: Int): Array[Long] = {
    val words = tokenize(s)
    val n = words.length
    if (n < k) return Array.emptyLongArray
    val wh1 = new Array[Long](n)
    val wh2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      wh1(i) = polyHash(words(i))
      wh2(i) = polyHash2(words(i))
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    var p = 0
    while (p <= n - k) {
      var g1 = 0L
      var g2 = 0L
      var j = p
      while (j < p + k) {
        g1 = (g1 * 31 + wh1(j)) % P
        g2 = (g2 * 131 + wh2(j)) % TextHash.P2
        j += 1
      }
      out(p) = g1 * TextHash.P2 + g2
      p += 1
    }
    out
  }

  /** Winnow-selected fingerprint hashes — the kernel of
    * TextHash.winnowGramsSpark + winnowSelectSpark (robust winnowing,
    * Schleimer/Wilkerson/Aiken SIGMOD 2003): per-position single-fold
    * k-gram hashes g (base 31, mod P over per-word poly-hashes), then each
    * w-window's minimum by (hash, rightmost position) via the packed key
    * g*2^20 + (2^20 - 1 - pos), distinct in first-occurrence order
    * (matching array_distinct). Windows clip at the array end; fewer than
    * w grams yields the global min; fewer than k words yields nothing.
    * O(n·(k + w)) long ops, word hashes computed once. */
  def winnowSelect(s: String, k: Int, w: Int): Array[Long] = {
    val words = tokenize(s)
    val n = words.length
    if (n < k) return Array.emptyLongArray
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) { wh(i) = polyHash(words(i)); i += 1 }
    val m = n - k + 1
    // position regime bound, enforced (not just documented): at
    // m >= 2^20 - 1 the packed tie-break addend (M - 1 - pos) goes
    // negative, which can decrement the recovered hash (key div M) and
    // silently corrupt fingerprints while engine/oracle stay in parity
    // (same arithmetic both sides — no signal). Fail fast instead,
    // mirroring densestSubgraph's int64-headroom require; million-gram
    // docs belong to the substring-index family, not winnowing.
    require(m < TextHash.WinnowM - 1,
      s"winnowSelect: $m gram positions >= 2^20 - 1 — past the packed " +
        "(hash, -pos) tie-break regime; route docs this long to the " +
        "substring-span dedup family")
    val g = new Array[Long](m)
    var p = 0
    while (p < m) {
      var acc = 0L
      var j = p
      while (j < p + k) { acc = (acc * 31 + wh(j)) % P; j += 1 }
      g(p) = acc
      p += 1
    }
    val M = TextHash.WinnowM
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val starts = math.max(1, m - w + 1)
    var s0 = 0
    while (s0 < starts) {
      // packed (hash, -pos) min over the clipped window [s0, s0+w)
      var best = Long.MaxValue
      var j = s0
      val end = math.min(s0 + w, m)
      while (j < end) {
        // HOF positions are 1-based: encode M - 1 - (j + 1)
        val key = g(j) * M + (M - 2 - j)
        if (key < best) best = key
        j += 1
      }
      out.add(best / M)
      s0 += 1
    }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    var r = 0
    while (it.hasNext) { res(r) = it.next(); r += 1 }
    res
  }

  /** SimBits-bit simhash over a word-hash multiset: majority vote per bit */
  def simHash(wh: Array[Long]): Long = {
    val bits = TextHash.SimBits
    val counts = new Array[Int](bits)
    var i = 0
    while (i < wh.length) {
      val h = wh(i)
      var j = 0
      while (j < bits) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) sim |= 1L << j
      j += 1
    }
    sim
  }

  /** minhash signature as the expression kernel returns it: on an EMPTY
    * hash set every signature entry is null, exactly like the HOF twin
    * (array_min of an empty array) and DuckDB's list_min — found by
    * FunctionsFuzzSpec; the old Long.MaxValue sentinel was bit-different
    * (masked downstream only because empty docs band-match each other and
    * the NaN Jaccard verify rejects them on both engines). */
  def minHashOrNulls(hs: Array[Long]): org.apache.spark.sql.catalyst.util.GenericArrayData =
    if (hs.isEmpty)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.fill[Any](TextHash.NumHashes)(null))
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(minHash(hs))

  /** minhash signature (NumHashes affine permutations) over a hash set */
  def minHash(hs: Array[Long]): Array[Long] = {
    val k = TextHash.NumHashes
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      val a = TextHash.As(j)
      val b = TextHash.Bs(j)
      var mn = Long.MaxValue
      var i = 0
      while (i < hs.length) {
        val v = (a * hs(i) + b) % P
        if (v < mn) mn = v
        i += 1
      }
      out(j) = mn
      j += 1
    }
    out
  }

  /** [n_grams, n_uniq_grams, top_gram_n] over the word-bigram multiset of
    * `s` — one tokenization, one counting pass (O(words) expected), no
    * intermediate gram arrays. Gram identity is the space-joined pair,
    * exactly the HOF/DuckDB formulation (words contain no spaces, so the
    * join is unambiguous). Kernel of `TextAnalysis.repetition`. */
  def bigramStats(s: String): Array[Long] = {
    val words = tokenize(s)
    val n = words.length - 1
    if (n <= 0) return Array(0L, 0L, 0L)
    val counts = new java.util.HashMap[String, Integer]()
    var top = 0
    var i = 0
    while (i < n) {
      val g = words(i) + " " + words(i + 1)
      val c = counts.merge(g, Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      if (c.intValue > top) top = c.intValue
      i += 1
    }
    Array(n.toLong, counts.size.toLong, top.toLong)
  }

  /** Jaccard similarity of two DISTINCT-element hash arrays: sorted-copy
    * two-pointer intersection count, then the same double division as the
    * HOF form (`TextHash.jaccardSpark`) — |∩| is an exact integer either
    * way, so the result is bit-identical. */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    val x = a.clone(); val y = b.clone()
    java.util.Arrays.sort(x); java.util.Arrays.sort(y)
    var i = 0; var j = 0; var inter = 0
    while (i < x.length && j < y.length) {
      if (x(i) < y(j)) i += 1
      else if (x(i) > y(j)) j += 1
      else { inter += 1; i += 1; j += 1 }
    }
    inter.toDouble / (a.length + b.length - inter)
  }

  /** dim-float hash-projection text features — the kernel twin of
    * TextAnalysis.featurize's HOF formulation (FunctionsSpec enforces
    * bit-equivalence; change both together): per word h = polyHash(w)
    * % 100003, feature d accumulates (h*(131*(d+1)) + 137*d) % 29 - 14
    * in exact int64, cast to float at the end (lossless: |sum| << 2^24).
    */
  def textFeatures(s: String, dim: Int): Array[Float] = {
    val words = tokenize(s)
    val acc = new Array[Long](dim)
    var i = 0
    while (i < words.length) {
      val h = polyHash(words(i)) % 100003L
      var d = 0
      while (d < dim) {
        acc(d) += (h * (131L * (d + 1)) + 137L * d) % 29L - 14L
        d += 1
      }
      i += 1
    }
    val out = new Array[Float](dim)
    var k = 0
    while (k < dim) { out(k) = acc(k).toFloat; k += 1 }
    out
  }
}

/** Vector kernels for the embedding operators — strictly sequential folds
  * in double precision, matching Similarity.dotSpark/dotDuck bit for bit.
  */
object VecImpl {
  def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  /** packed sign bits of the NumHyperplanes deterministic hyperplanes
    * (Similarity.coef); bit t set when the signed projection is >= 0 */
  def hyperplaneBits(v: Array[Float]): Long = {
    var bits = 0L
    var t = 0
    while (t < graft.pipeline.Similarity.NumHyperplanes) {
      var acc = 0.0
      var i = 0
      while (i < v.length) {
        acc += v(i).toDouble * ((t * 131 + i * 137) % 29 - 14)
        i += 1
      }
      if (acc >= 0.0) bits |= 1L << t
      t += 1
    }
    bits
  }

  /** coef2 hyperplane rows cached per t for dims up to NdCoefCacheDim —
    * turns the kernel's inner-loop modulo chain into an array read. The
    * cached values are the EXACT integers of the inline formula widened
    * to double (ints are exact in double), so products and the sequential
    * fold are bit-identical to the uncached path and to the HOF twin
    * (FunctionsSpec enforces). ~64 KB total at 128 hyperplanes x 512. */
  private val NdCoefCacheDim = 512
  private lazy val ndCoefRows: Array[Array[Double]] = {
    val nT = graft.pipeline.Similarity.NdBands * graft.pipeline.Similarity.NdMaxBits
    Array.tabulate(nT)(t =>
      Array.tabulate(NdCoefCacheDim)(i => ((t * 73 + i * 151) % 31 - 15).toDouble))
  }

  /** Per-band FULL-width near-dup bucket keys: element b is the
    * NdMaxBits-bit key of band b, built from the dedicated coef2
    * hyperplane family (t = b*NdMaxBits + r). Callers mask the keys down
    * to the corpus-size-adaptive width — computing full width here keeps
    * this kernel corpus-independent (and the DuckDB twin static). */
  def nearDupKeys(v: Array[Float]): Array[Long] = {
    val out = new Array[Long](graft.pipeline.Similarity.NdBands)
    val cached = v.length <= NdCoefCacheDim
    var b = 0
    while (b < out.length) {
      var key = 0L
      var r = 0
      while (r < graft.pipeline.Similarity.NdMaxBits) {
        val t = b * graft.pipeline.Similarity.NdMaxBits + r
        var acc = 0.0
        var i = 0
        if (cached) {
          val row = ndCoefRows(t)
          while (i < v.length) { acc += v(i) * row(i); i += 1 }
        } else {
          while (i < v.length) {
            acc += v(i).toDouble * ((t * 73 + i * 151) % 31 - 15)
            i += 1
          }
        }
        if (acc >= 0.0) key |= 1L << r
        r += 1
      }
      out(b) = key
      b += 1
    }
    out
  }
}
