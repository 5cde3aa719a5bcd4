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

  /** Distinct word 3-gram shingles; docs with <3 tokens get a single
    * empty-string shingle so the signature stays well-defined.
    */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))))
      .otherwise(array(lit("")))

  /** Jaccard similarity of two string arrays (distinct semantics). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_distinct(concat(a, b))).cast("double")

  /** MinHash signature: k seeded min-hashes over the shingle set.
    * Row-local: k × |shingles| md5 calls inside codegen, no shuffle.
    */
  def minhashSig(grams: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      s => array_min(transform(grams,
        g => md5Long(concat(s.cast("string"), lit(":"), g)))))

  /** LSH band key for band `b` of a signature with `r` rows per band:
    * md5 of the comma-joined band slice.
    */
  def bandKey(sig: Column, b: Column, r: Int): Column =
    md5(array_join(
      transform(slice(sig, b * r + 1, lit(r)), x => x.cast("string")), ","))

  /** 32-bit SimHash over the (non-distinct) token multiset: per bit,
    * +1/-1 votes from each token's md5-derived hash; bit set iff the vote
    * sum is positive. Row-local nested higher-order functions.
    */
  def simhash32(toks: Column): Column = {
    val hashes = transform(toks, w => md5Long(w))
    aggregate(
      transform(sequence(lit(0), lit(31)), i =>
        when(
          aggregate(hashes, lit(0L),
            (acc, h) => acc + when(shiftright(h, i) % 2 === 1, 1L).otherwise(-1L))
            > 0,
          shiftleft(lit(1L), i)).otherwise(lit(0L))),
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
