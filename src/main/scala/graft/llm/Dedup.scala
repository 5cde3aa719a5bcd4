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

  /** N-gram Jaccard near-dup pairs: blocked all-pairs, Jaccard ≥ 0.5. */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = shingled(s, dir)
    sh.as("a").join(sh.as("b"),
        col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id") &&
          abs(col("a.n_chars") - col("b.n_chars")) <= 30)
      .select(
        col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        jaccard(col("a.grams"), col("b.grams")).as("jac"))
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
    val sig = sh.select(col("doc_id"), minhashSig(col("grams"), MinhashK).as("sig"))
    val bands = sig.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(Bands - 1)),
        b => struct(b.as("band_idx"), bandKey(col("sig"), b, RowsPerBand).as("key"))))
        .as("bd"))
      .select(col("doc_id"), col("bd.band_idx").as("band_idx"), col("bd.key").as("key"))
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

  /** SimHash near-dup pairs: 32-bit sketch per doc, pairs blocked on lang,
    * kept when Hamming distance ≤ 6.
    */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    val sk = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), simhash32(tokens(col("text"))).as("sh"))
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
    t(s, dir, "documents")
      .select(col("doc_id"), simhash32(tokens(col("text"))).as("simhash"))
      .orderBy("doc_id")
}
