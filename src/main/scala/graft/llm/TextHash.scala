package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hashing/shingling column builders shared by the dedup and
  * text-analysis operators (SURVEY.md §2.11).
  *
  * Every hash is derived from the hex md5 of the input string — md5 is
  * bit-identical in any engine (Spark, DuckDB, Trino, ...), which makes
  * MinHash/SimHash/fingerprint results exactly reproducible by the
  * differential oracle, unlike engine-private hashes (xxhash64, murmur).
  * All builders are row-local `Column` expressions: they run inside
  * whole-stage codegen at scan speed and never shuffle.
  */
object TextHash {

  /** 32-bit unsigned hash as a long: first 8 hex digits of md5. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Whitespace tokenization (documents are space-separated words). */
  def tokens(c: Column): Column = split(c, "\\s+")

  /** All distinct joined triples of consecutive elements, built by zipping
    * three shifted slices (all length n-2) instead of indexed element_at
    * over a sequence: when `arr` is an inlined expression (e.g.
    * split(text)), every element_at re-evaluates it, making the indexed
    * form O(n²) evaluations per row — the slice form evaluates the array a
    * constant number of times (~10× faster at the same semantics).
    * Arrays with <3 elements yield the caller-supplied fallback.
    */
  def slidingTriples(arr: Column, sep: String, fallback: Column): Column = {
    val n = size(arr)
    when(n >= 3,
      array_distinct(zip_with(
        slice(arr, lit(1), n - 2),
        zip_with(slice(arr, lit(2), n - 2), slice(arr, lit(3), n - 2),
          (b, c) => concat(b, lit(sep), c)),
        (a, bc) => concat(a, lit(sep), bc))))
      .otherwise(fallback)
  }

  /** Distinct word 3-gram shingles; docs with <3 tokens get a single
    * empty-string shingle so the signature stays well-defined. Native
    * codegen'd expression ([[graft.functions.WordShingles]]); the
    * declarative form stays as [[shingles3Hof]], pinned equal by
    * WordShinglesSpec.
    */
  def shingles3(toks: Column): Column =
    graft.functions.WordShingles(toks)

  /** The declarative (zipped-slices) form — the executable specification
    * for the native expression.
    */
  def shingles3Hof(toks: Column): Column =
    slidingTriples(toks, " ", array(lit("")))

  /** Jaccard similarity of two string arrays (distinct semantics). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_distinct(concat(a, b))).cast("double")

  /** Prime modulus for the affine MinHash mixes (smallest prime > 2^32). */
  val MinhashPrime = 4294967311L

  /** MinHash signature: ONE md5 per shingle, then k cheap affine mixes
    * h_s = (h·(2s+1) + s·12582917) mod p — the standard universal-hash
    * family. This is k× cheaper than seeded re-hashing: at 100 TB the md5
    * is the dominant cost and it is paid once per shingle, not once per
    * (shingle, seed).
    *
    * Implementation note: the whole signature is ONE `aggregate` fold whose
    * input array (the md5s) is evaluated exactly once — an outer
    * transform-over-seeds would re-evaluate the md5 array per seed after
    * Catalyst collapses the projections (lambda bodies are not hoisted as
    * loop-invariant).
    */
  def minhashSig(grams: Column, k: Int): Column =
    aggregate(
      transform(grams, g => md5Long(g)),
      array_repeat(lit(Long.MaxValue), k),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(k - 1)),
          s => (h * (s * 2 + 1) + s * 12582917L) % MinhashPrime),
        (a, b) => least(a, b)))

  /** LSH band key for band `b` of a signature with `r` rows per band:
    * md5 of the comma-joined band slice.
    */
  def bandKey(sig: Column, b: Column, r: Int): Column =
    md5(array_join(
      transform(slice(sig, b * r + 1, lit(r)), x => x.cast("string")), ","))

  /** MinHash agreement estimate of Jaccard between two k-component
    * signatures: (agreeing components)/k, the unbiased estimator. ONE
    * definition — the batch estimator query and the streaming
    * incremental-dedup verdict must never diverge on this arithmetic
    * (matches/k is a power-of-two-denominator exact double at k=32).
    */
  def minhashAgreement(a: Column, b: Column, k: Int): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), v => v))
      .cast("double") / k

  /** 32-bit SimHash over the (non-distinct) token multiset: per bit,
    * +1/-1 votes from each token's md5-derived hash; bit set iff the vote
    * sum is positive.
    *
    * Cost model: ONE md5 per token (the token hashes are materialized as an
    * array first), then a single fold accumulating a 32-long vote vector
    * with cheap shift arithmetic — not one token scan per bit. Row-local,
    * no shuffle.
    */
  def simhash32(toks: Column): Column = {
    val hashes = transform(toks, w => md5Long(w))
    val votes = aggregate(hashes, array_repeat(lit(0L), 32),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(31)),
          i => when(shiftright(h, i) % 2 === 1, 1L).otherwise(-1L)),
        (a, b) => a + b))
    aggregate(
      zip_with(votes, sequence(lit(0L), lit(31L)),
        (v, i) => when(v > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Order-sensitive document fingerprint: polynomial rolling hash of the
    * token hash sequence mod 2^31-1 (a rolling-hash analog that any engine
    * can replay: fp = fold((acc, h) => (acc*31 + h) mod p)).
    */
  def fingerprint(toks: Column): Column =
    aggregate(transform(toks, w => md5Long(w)), lit(0L),
      (acc, h) => (acc * 31 + h) % 2147483647L)

  /** The Scala DSL's shift builtins take literal Int bit counts, so the
    * dynamic-bit forms used by SimHash go through 2^i arithmetic — exact in
    * double for i ≤ 32, truncating cast = floor for non-negative inputs.
    */
  private def pow2(i: Column): Column = pow(lit(2.0), i).cast("long")

  private def shiftright(h: Column, i: Column): Column =
    (h / pow2(i)).cast("long")

  private def shiftleft(one: Column, i: Column): Column = one * pow2(i)
}
