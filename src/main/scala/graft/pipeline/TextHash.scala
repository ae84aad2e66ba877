package graft.pipeline

/** Deterministic hashing primitives shared between the Spark engine and the
  * DuckDB oracle. Everything is expressed in 64-bit integer arithmetic that
  * both engines evaluate identically (no engine-native hash functions, which
  * differ), from the same coefficient constants.
  *
  * Two dialect generators per primitive: `*Spark` (Spark SQL expression
  * string, used via expr()) and `*Duck` (DuckDB SQL). Structurally the same
  * computation; only function names differ (aggregate/list_reduce,
  * element_at/[], size/len, sequence/range).
  */
object TextHash {
  /** modulus for polynomial string hashes (prime, < 2^30 so a*h fits i64) */
  val P = 1000000007L
  /** multiplier spreading poly-hashes across 32 bits (Knuth) */
  val Spread = 2654435761L

  // MinHash configuration: 16 signatures in 4 bands of 4 rows.
  val NumHashes = 16
  val Bands = 4
  val RowsPerBand: Int = NumHashes / Bands
  /** affine minhash coefficients h_j(x) = (A_j x + B_j) mod P */
  val As: IndexedSeq[Long] = (1 to NumHashes).map(j => (BigInt(Spread) * j % P).toLong)
  val Bs: IndexedSeq[Long] = (1 to NumHashes).map(j => ((BigInt(972663749L) * j + 12345) % P).toLong)

  // SimHash configuration: 48-bit signatures. (16/32 bits are measurably
  // too coarse on word-distribution-similar corpora; 48 is the widest that
  // still fits signed-int64 arithmetic in both engines.) Band-join
  // candidate generation is exact whenever bands > radius (pigeonhole:
  // fewer differing bits than bands leaves one band identical), so the
  // band count DERIVES from the radius — the fewest exact bands, which
  // maximizes key width and minimizes raw candidates (n²/2^width per
  // band). A fixed 6x8 banding at radius 3 emitted ~24x the candidates of
  // the derived 4x12 for the identical final output.
  val SimBits = 48
  /** legal band counts: divisors of SimBits, so bands slice evenly */
  private val SimBandChoices = (1 to SimBits).filter(SimBits % _ == 0)

  /** fewest bands whose equi-join is exact at hamming radius `maxHamming` */
  def simBandsFor(maxHamming: Int): Int = {
    require(maxHamming >= 0 && maxHamming < SimBits,
      s"simhash radius must be in [0, ${SimBits - 1}], got $maxHamming")
    SimBandChoices.find(_ > maxHamming).get
  }

  // --- polynomial hash of a string expression: fold (acc*31 + code) % P ---
  // Spark's split(s, '') can emit empty strings (regex-split artifacts);
  // DuckDB's string_split(s, '') never does — filter them so folds agree.
  def polyHashSpark(s: String): String =
    s"aggregate(filter(split($s, ''), c -> c <> ''), CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + ascii(c)) % $P)"
  def polyHashDuck(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($s, ''), c -> CAST(ascii(c) AS BIGINT))), (acc, x) -> (acc * 31 + x) % $P)"

  /** second, independent polynomial hash — different base AND modulus
    * (131 mod P2), so a pair colliding under both hashes needs the same
    * codepoint fold to land twice: pairwise collision odds drop from 1/P
    * to ~1/(P·P2) ≈ 1e-18. 131·P2 < 2^37, so acc*131+cp stays in i64. */
  val P2 = 998244353L
  def polyHash2Spark(s: String): String =
    s"aggregate(filter(split($s, ''), c -> c <> ''), CAST(0 AS BIGINT), (acc, c) -> (acc * 131 + ascii(c)) % $P2)"
  def polyHash2Duck(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($s, ''), c -> CAST(ascii(c) AS BIGINT))), (acc, x) -> (acc * 131 + x) % $P2)"

  // --- word arrays (whitespace tokenization; identical on both engines) ---
  def wordsSpark(text: String): String = s"split(trim($text), ' ')"
  def wordsDuck(text: String): String = s"string_split(trim($text), ' ')"

  // --- n-word shingles of a words-array expression `ws` (n=3) ---
  // guarded: sequence(1, 0) in Spark is the DESCENDING [1, 0], whose
  // element_at(ws, 0) throws — short docs must yield an empty shingle set
  // (DuckDB's range(1, n) is simply empty for n <= 1)
  def shinglesSpark(ws: String): String =
    s"IF(size($ws) >= 3, transform(sequence(1, size($ws) - 2), i -> concat_ws(' ', element_at($ws, i), element_at($ws, i + 1), element_at($ws, i + 2))), CAST(array() AS ARRAY<STRING>))"
  def shinglesDuck(ws: String): String =
    s"list_transform(range(1, len($ws) - 1), i -> concat_ws(' ', $ws[i], $ws[i+1], $ws[i+2]))"

  /** distinct poly-hashes of the 3-shingle set of `ws` */
  def shingleHashesSpark(ws: String): String =
    s"array_distinct(transform(${shinglesSpark(ws)}, sh -> ${polyHashSpark("sh")}))"
  def shingleHashesDuck(ws: String): String =
    s"list_distinct(list_transform(${shinglesDuck(ws)}, sh -> ${polyHashDuck("sh")}))"

  // --- per-word polynomial hash arrays (exact-substring dedup input) ---
  def wordPolyHashesSpark(ws: String): String =
    s"transform($ws, w -> ${polyHashSpark("w")})"
  def wordPolyHashesDuck(ws: String): String =
    s"list_transform($ws, w -> ${polyHashDuck("w")})"
  def wordPolyHashes2Spark(ws: String): String =
    s"transform($ws, w -> ${polyHash2Spark("w")})"
  def wordPolyHashes2Duck(ws: String): String =
    s"list_transform($ws, w -> ${polyHash2Duck("w")})"

  /** Per-position k-gram keys over precomputed word-hash arrays `wh1`/`wh2`
    * (column/CTE names, NOT inline exprs — inlining would recompute the
    * char-level fold k times per position). Position i's key combines two
    * independent word-hash folds into one BIGINT:
    *   g1 = fold_{j=i..i+k-1} (acc*31 + wh1[j]) % P     (base 31, mod P)
    *   g2 = fold_{j=i..i+k-1} (acc*131 + wh2[j]) % P2   (base 131, mod P2)
    *   key = g1 * P2 + g2   (< P·P2 ≈ 1e18, fits i64)
    * Two grams colliding need BOTH folds equal: ~1/(P·P2) ≈ 1e-18 pairwise
    * — the same double-hash exactness convention as the 128-bit
    * fingerprint dedup. Cost O(k) integer ops per position over the
    * precomputed word hashes (O(n·k) per doc, not O(n·k·chars)). */
  def gramKeysSpark(wh1: String, wh2: String, k: Int): String =
    s"IF(size($wh1) >= $k, transform(sequence(1, size($wh1) - ${k - 1}), i -> " +
      s"aggregate(slice($wh1, i, $k), CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % $P) * $P2 + " +
      s"aggregate(slice($wh2, i, $k), CAST(0 AS BIGINT), (acc, x) -> (acc * 131 + x) % $P2)), " +
      s"CAST(array() AS ARRAY<BIGINT>))"

  /** DuckDB twin of one position's gram key — scalar form, `pos` is a
    * 1-based position expr (the SQL unnests positions before keying). */
  def gramKeyDuck(wh1: String, wh2: String, pos: String, k: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $wh1[$pos:$pos+${k - 1}]), (acc, x) -> (acc * 31 + x) % $P) * $P2 + " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), $wh2[$pos:$pos+${k - 1}]), (acc, x) -> (acc * 131 + x) % $P2)"

  // --- winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
  // SIGMOD 2003 — the MOSS local-document-fingerprinting algorithm) ---
  // From the per-position k-gram hash array, every w-window contributes
  // its minimum hash (ties to the RIGHTMOST position — the "robust
  // winnowing" rule that makes selection stable under edits); the distinct
  // selected hashes are the document's fingerprint set, guaranteed density
  // ~2/(w+1) of the gram count. Tie-break rides an integer encoding
  // h * 2^20 + (2^20 - 1 - pos): minimizing the packed key minimizes
  // (h, -pos) lexicographically, and h < P < 2^30 keeps the product under
  // 2^50. Documented regime bound: positions < 2^20 (1M grams/doc) — far
  // past this corpus; longer docs belong to the substring-index family.
  val WinnowM: Long = 1L << 20

  /** per-position single-fold k-gram hashes (g1 only — selection wants a
    * small packable hash; cross-doc match verification is the shared-count
    * threshold, so mod-P collision odds only perturb candidate quality,
    * never oracle agreement, exactly like the minhash family) */
  def winnowGramsSpark(wh1: String, k: Int): String =
    s"IF(size($wh1) >= $k, transform(sequence(1, size($wh1) - ${k - 1}), i -> " +
      s"aggregate(slice($wh1, i, $k), CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % $P)), " +
      s"CAST(array() AS ARRAY<BIGINT>))"
  def winnowGramsDuck(wh1: String, k: Int): String =
    s"list_transform(range(1, len($wh1) - ${k - 1} + 1), i -> " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), $wh1[i:i+${k - 1}]), (acc, x) -> (acc * 31 + x) % $P))"

  /** distinct winnow-selected hashes of a gram-hash array expr `g`: one
    * packed-key min per w-window (windows clip at the array end; a doc
    * with fewer than w grams yields its global min — every non-empty doc
    * carries at least one fingerprint) */
  def winnowSelectSpark(g: String, w: Int): String =
    s"IF(size($g) >= 1, array_distinct(transform(sequence(1, greatest(1, size($g) - ${w - 1})), i -> " +
      s"array_min(transform(sequence(i, least(i + ${w - 1}, size($g))), j -> " +
      s"element_at($g, j) * $WinnowM + ($WinnowM - 1 - j))) div $WinnowM)), " +
      s"CAST(array() AS ARRAY<BIGINT>))"
  def winnowSelectDuck(g: String, w: Int): String =
    s"CASE WHEN len($g) >= 1 THEN list_distinct(list_transform(range(1, greatest(1, len($g) - ${w - 1}) + 1), i -> " +
      s"list_aggregate(list_transform(range(i, least(i + ${w - 1}, len($g)) + 1), j -> " +
      s"$g[j] * $WinnowM + ($WinnowM - 1 - j)), 'min') // $WinnowM)) " +
      s"ELSE CAST([] AS BIGINT[]) END"

  /** minhash signature array (NumHashes entries) over a hash-array expr `hs` */
  def minhashSpark(hs: String): String =
    (0 until NumHashes).map { j =>
      s"array_min(transform($hs, h -> (${As(j)} * h + ${Bs(j)}) % $P))"
    }.mkString("array(", ", ", ")")
  def minhashDuck(hs: String): String =
    (0 until NumHashes).map { j =>
      s"list_min(list_transform($hs, h -> (CAST(${As(j)} AS BIGINT) * h + ${Bs(j)}) % $P))"
    }.mkString("[", ", ", "]")

  /** LSH band key b (0-based) of a minhash-array expr `mh`: the band's
    * RowsPerBand signature values folded into one BIGINT ((acc*31+v) % P,
    * seeded with b). An 8-byte integer key instead of the previous
    * concatenated string (~40 B): the band self-join is THE corpus-wide
    * shuffle of the dedup pipeline, and key bytes are its width — the
    * string keys measured 5x the shuffle volume at the 10x sweep scale.
    * A fold collision can only create a false candidate pair, which
    * exact-Jaccard verification rejects; both engines run the identical
    * arithmetic, so candidate sets match regardless. */
  def bandKeySpark(mh: String, b: Int): String =
    s"aggregate(slice($mh, ${b * RowsPerBand + 1}, $RowsPerBand), CAST($b AS BIGINT), (acc, x) -> (acc * 31 + x) % $P)"
  def bandKeyDuck(mh: String, b: Int): String =
    s"list_reduce(list_prepend(CAST($b AS BIGINT), $mh[${b * RowsPerBand + 1}:${(b + 1) * RowsPerBand}]), (acc, x) -> (acc * 31 + x) % $P)"

  /** Jaccard similarity of two distinct-hash arrays (int arithmetic + one
    * double division — bit-identical across engines) */
  def jaccardSpark(a: String, b: String): String =
    s"CAST(size(array_intersect($a, $b)) AS DOUBLE) / (size($a) + size($b) - size(array_intersect($a, $b)))"
  def jaccardDuck(a: String, b: String): String =
    s"CAST(len(list_intersect($a, $b)) AS DOUBLE) / (len($a) + len($b) - len(list_intersect($a, $b)))"

  /** word-multiset hashes (order-insensitive input to simhash) of `ws` */
  def wordHashesSpark(ws: String): String =
    s"transform($ws, w -> (${polyHashSpark("w")} * $Spread) % ${1L << SimBits})"
  def wordHashesDuck(ws: String): String =
    s"list_transform($ws, w -> (${polyHashDuck("w")} * $Spread) % ${1L << SimBits})"

  /** 16-bit simhash of a word-hash array expr `wh`: per bit, sum +/-1 over
    * words; set the bit when the sum is positive */
  def simhashSpark(wh: String): String =
    (0 until SimBits).map { j =>
      val d = 1L << j
      s"IF(aggregate($wh, CAST(0 AS BIGINT), (acc, h) -> acc + 2 * ((h div $d) % 2) - 1) > 0, $d, 0)"
    }.mkString(" + ")
  def simhashDuck(wh: String): String =
    (0 until SimBits).map { j =>
      val d = 1L << j
      s"CASE WHEN list_sum(list_transform($wh, h -> 2 * ((h // $d) % 2) - 1)) > 0 THEN $d ELSE 0 END"
    }.mkString(" + ")

  /** simhash band value b of `bands` equal slices of the signature */
  def simBandSpark(sim: String, b: Int, bands: Int): String = {
    val w = SimBits / bands
    s"(($sim) div ${1L << (b * w)}) % ${1L << w}"
  }
  def simBandDuck(sim: String, b: Int, bands: Int): String = {
    val w = SimBits / bands
    s"(($sim) // ${1L << (b * w)}) % ${1L << w}"
  }
}
