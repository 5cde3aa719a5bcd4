package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Null-hypothesis audit for a [[GenText]] tier: counts CROSS-VARIANT
  * pairs in each near-dup family. The construction guarantees zero for
  * the token-identity families (ngram Jaccard, MinHash-LSH — vocabularies
  * are disjoint, so cross-variant shingle overlap is empty); the SimHash
  * families may show the CHANCE noise floor (P[Hamming ≤ 3 of 64] ≈
  * 2.4e-12 per same-language pair — the same floor two unrelated real
  * corpora share), which this tool makes visible instead of assumed.
  *
  * Usage: runMain graft.GenTextCheck <dir>
  * Prints ONE JSON line.
  */
object GenTextCheck {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-variant id stride: the smallest power of ten above the max
    // variant-0 doc_id — recomputed the same way GenText derived it
    // (variant 0 ids are the source ids, so the min nonzero stride in the
    // id set IS the offset; take the power of ten below the second id
    // band). Robust shortcut: gcd-like — the offset is the smallest
    // power of ten p with max(doc_id) >= p and all variant-0 ids < p.
    val ids = Tables.table(spark, dir, "documents")
      .agg(max(col("doc_id")).as("mx")).head().getLong(0)
    // walk powers of ten; the stride divides max id and bounds variant 0
    val counts = Tables.table(spark, dir, "documents")
    def variantsAt(p: Long): Long =
      counts.select((col("doc_id") / p).cast("long")).distinct().count()
    // the true stride is the largest power of ten where the variant count
    // equals max/p + 1 (contiguous bands); smaller powers over-split
    val stride = Iterator.iterate(10L)(_ * 10).take(12)
      .filter(p => p <= ids)
      .map(p => (p, variantsAt(p)))
      .toSeq
      .filter { case (p, nv) => nv == ids / p + 1 }
      .map(_._1).headOption.getOrElse(
        sys.error("could not infer the GenText id stride"))

    def crossOf(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val withX = df.withColumn("x",
        (col("a_id") / stride).cast("long") =!= (col("b_id") / stride).cast("long"))
      val r = withX.agg(count(lit(1)), sum(when(col("x"), 1L).otherwise(0L)))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    val (simN, simX) = crossOf(graft.llm.Dedup.simhash64Pairs(spark, dir))
    val (ngN, ngX) = crossOf(graft.llm.Dedup.ngramJaccard(spark, dir))
    val (mhN, mhX) = crossOf(graft.llm.Dedup.minhashLsh(spark, dir))
    println(s"""{"metric":"gentext_nullcheck","dir":"$dir","stride":$stride,""" +
      s""""simhash64":{"pairs":$simN,"cross_variant":$simX},""" +
      s""""ngram":{"pairs":$ngN,"cross_variant":$ngX},""" +
      s""""minhash":{"pairs":$mhN,"cross_variant":$mhX}}""")
    spark.stop()
  }
}
