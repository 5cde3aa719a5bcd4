package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{table => t}
import TextHash._

/** Deduplication operators over the `documents` table (SURVEY.md §2.11) —
  * the operations a training-data pipeline runs before anything else.
  *
  * Scale design, in order of cost:
  *  - exact: one hash-aggregate shuffle on md5(text) — the canonical
  *    100 TB dedup; only digests move through the shuffle, never text.
  *  - n-gram Jaccard: all-pairs is quadratic, so pairs are blocked on
  *    (lang, |len diff| ≤ 30): the self-join is an equi-join on lang with a
  *    residual length predicate; at scale the blocking key keeps bucket
  *    sizes bounded.
  *  - MinHash+LSH: the scale path — signatures are computed row-local
  *    (k·|shingles| md5s inside codegen, no shuffle), then one shuffle on
  *    (band, key) generates candidates; only candidates pay the exact
  *    Jaccard verification. Candidate count ≈ near-dup count, not n².
  *  - SimHash: one 64→32-bit row-local sketch; pairs blocked on lang and
  *    filtered by Hamming distance via bit_count(xor).
  */
object Dedup {

  /** Exact dedup (`dropDuplicates` semantics, made observable): group by
    * content digest, keep the smallest doc_id as the canonical copy.
    */
  def exact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(md5(col("text")).as("digest"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")

  /** Shingled documents: (doc_id, lang, n_chars, grams). */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        shingles3(tokens(col("text"))).as("grams"))

  /** N-gram Jaccard near-dup pairs (Jaccard ≥ 0.5, same lang, length diff
    * ≤ 30) via an inverted-index set-similarity join: explode shingles to
    * postings, equi-join postings on the shingle to count |A∩B| per pair,
    * then Jaccard from |A∩B|/(|A|+|B|−|A∩B|).
    *
    * Same result set as the naive blocked all-pairs (pairs sharing zero
    * shingles have Jaccard 0 and can never pass the threshold), but the
    * cost is Σ_g c_g² over shingle frequencies instead of Σ_block n² full
    * array intersections — the formulation that survives a 100× corpus,
    * and every step is an equi-join/hash-agg that shuffles only small
    * (doc_id, doc_id) pairs, never documents.
    */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = shingled(s, dir).cache()
    val sizes = sh.select(col("doc_id"), col("lang"), col("n_chars"),
      size(col("grams")).as("sz"))
    val posts = sh.select(col("doc_id").as("p_id"), explode(col("grams")).as("gram"))
    val shared = posts.as("x").join(posts.as("y"),
        col("x.gram") === col("y.gram") && col("x.p_id") < col("y.p_id"))
      .groupBy(col("x.p_id").as("a_id"), col("y.p_id").as("b_id"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("doc_id"), col("lang").as("a_lang"),
        col("n_chars").as("a_chars"), col("sz").as("a_sz")), col("a_id") === col("doc_id"))
      .drop("doc_id")
      .join(sizes.select(col("doc_id"), col("lang").as("b_lang"),
        col("n_chars").as("b_chars"), col("sz").as("b_sz")), col("b_id") === col("doc_id"))
      .filter(col("a_lang") === col("b_lang") &&
        abs(col("a_chars") - col("b_chars")) <= 30)
      .select(col("a_id"), col("b_id"),
        (col("shared").cast("double") /
          (col("a_sz") + col("b_sz") - col("shared")).cast("double")).as("jac"))
      .filter(col("jac") >= 0.5)
      .orderBy("a_id", "b_id")
  }

  val MinhashK = 32
  val Bands = 8
  val RowsPerBand: Int = MinhashK / Bands

  /** MinHash + LSH near-dup pairs: banded signatures → bucket join →
    * exact-Jaccard verification of candidates only.
    */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val sh = shingled(s, dir).cache()
    // signature via explode + k min-aggregates: one md5 per (doc, shingle)
    // row, then vectorized hash aggregation with map-side partial mins — the
    // shuffle carries only (doc_id, k minima), not shingles. Faster than the
    // row-local array fold (no per-shingle array allocation) and the partial
    // aggregation shape is exactly what scales on a cluster.
    val mixes = (0 until MinhashK).map { s =>
      min((col("h") * (2 * s + 1) + s * 12582917L) % TextHash.MinhashPrime).as(s"m$s")
    }
    val sig = sh
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .select(col("doc_id"), md5Long(col("gram")).as("h"))
      .groupBy(col("doc_id"))
      .agg(mixes.head, mixes.tail: _*)
      .select(col("doc_id"),
        array((0 until MinhashK).map(i => col(s"m$i")): _*).as("sig"))
    // cache: both sides of the candidate self-join read bands; without the
    // cache the whole explode+md5+groupBy signature pipeline runs twice
    val bands = sig.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(Bands - 1)),
        b => struct(b.as("band_idx"), bandKey(col("sig"), b, RowsPerBand).as("key"))))
        .as("bd"))
      .select(col("doc_id"), col("bd.band_idx").as("band_idx"), col("bd.key").as("key"))
      .cache()
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    cand
      .join(sh.select(col("doc_id"), col("grams").as("a_grams")), col("a_id") === col("doc_id"))
      .drop("doc_id")
      .join(sh.select(col("doc_id"), col("grams").as("b_grams")), col("b_id") === col("doc_id"))
      .select(col("a_id"), col("b_id"),
        jaccard(col("a_grams"), col("b_grams")).as("jac"))
      .filter(col("jac") >= 0.5)
      .orderBy("a_id", "b_id")
  }

  /** SimHash sketch table (doc_id, lang, sh) via explode + 32 codegen'd
    * vote-sum aggregates. Semantically identical to the row-local
    * TextHash.simhash32 fold, but higher-order functions are interpreted
    * (CodegenFallback) while hash aggregation is whole-stage codegen'd with
    * map-side partials — the shuffle carries (doc_id, 32 longs) only.
    */
  private def simhashTable(s: SparkSession, dir: String): DataFrame = {
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("w"))
      .select(col("doc_id"), col("lang"), md5Long(col("w")).as("h"))
    // (h / 2^i) is exact in double (power-of-two divisor), truncating cast
    // = floor for non-negative h
    val votes = (0 until 32).map { i =>
      sum(when((col("h") / lit(1L << i)).cast("long") % 2 === 1, 1L)
        .otherwise(-1L)).as(s"b$i")
    }
    val value = (0 until 32)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    tok.groupBy(col("doc_id"), col("lang"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), col("lang"), value.as("sh"))
  }

  /** SimHash near-dup pairs: 32-bit sketch per doc, pairs blocked on lang,
    * kept when Hamming distance ≤ 6.
    */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    // cache: the sketch is the expensive part; the self-join must read it,
    // not recompute it per side
    val sk = simhashTable(s, dir).cache()
    sk.as("a").join(sk.as("b"),
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("int").as("hamming"))
      .filter(col("hamming") <= 6)
      .orderBy("a_id", "b_id")
  }

  /** Per-doc SimHash sketch (the sketch itself, for oracle-pinning the
    * bit-vote arithmetic independent of the pairing policy).
    */
  def simhashSketch(s: SparkSession, dir: String): DataFrame =
    simhashTable(s, dir)
      .select(col("doc_id"), col("sh").as("simhash"))
      .orderBy("doc_id")
}
