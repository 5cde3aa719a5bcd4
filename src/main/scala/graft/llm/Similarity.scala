package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{table => t}

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY.md §2.11): brute-force cosine top-k as the exact baseline, and an
  * IVF-style clustered variant as the scale path.
  *
  * Scale design: the query set is small and broadcast, so brute force is one
  * pass over the corpus with a row-local dot product (codegen'd higher-order
  * functions, no UDF) followed by a per-query top-k window — at 100 TB the
  * corpus never shuffles, only (n_queries × corpus) partial results feed the
  * window, and that input is pre-filtered by rank locality via the IVF
  * variant: centroids prune the corpus to one cluster before the expensive
  * scan, which is exactly how IVF indexes cut ANN cost.
  *
  * Determinism: cosine is computed in double and rounded to 9 dp *before*
  * ranking; centroid components are exact DECIMAL(38,10) sums (addition of
  * decimals is associative, so the result is independent of partitioning and
  * reproducible in any engine — double sums would be order-dependent).
  */
object Similarity {

  /** Left-to-right dot product of two double arrays (sequential fold —
    * matches any engine that folds a list in order).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def corpus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))

  val NQueries = 20

  /** Brute-force cosine top-5 per query (first NQueries vec_ids are the
    * query set; self-matches excluded).
    */
  def bruteForceTopK(s: SparkSession, dir: String): DataFrame = {
    val c = corpus(s, dir)
    val queries = broadcast(
      c.filter(col("vec_id") < NQueries).select(col("vec_id").as("q_id"), col("v").as("qv")))
    val scored = c.join(queries, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("qv"), col("v")), 9).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("rk").cast("int").as("rk"), col("vec_id"), col("cos"))
      .orderBy("q_id", "rk")
  }

  /** Per-label centroid directions as exact decimal sums (unnormalized —
    * cosine is scale-invariant, so the sum direction equals the mean
    * direction and no order-sensitive division is needed).
    */
  def centroids(s: SparkSession, dir: String): DataFrame =
    corpus(s, dir)
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("x").cast("decimal(38,10)")).as("sx"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("sx").cast("double").as("cx"))))
        .as("ps"))
      .select(col("label").as("c_label"),
        transform(col("ps"), p => p.getField("cx")).as("centroid"))

  /** IVF-style ANN: route each query to its nearest centroid (10 clusters),
    * then exact top-3 within that cluster only — the corpus outside the
    * probed cluster is never scanned.
    */
  def ivfTopK(s: SparkSession, dir: String): DataFrame = {
    val c = corpus(s, dir)
    val queries = c.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val cents = broadcast(centroids(s, dir))
    val wq = Window.partitionBy(col("q_id"))
      .orderBy(col("ccos").desc, col("c_label"))
    val routed = queries.join(cents)
      .select(col("q_id"), col("qv"), col("c_label"),
        round(cosine(col("qv"), col("centroid")), 9).as("ccos"))
      .withColumn("crk", row_number().over(wq))
      .filter(col("crk") === 1)
      .select(col("q_id"), col("qv"), col("c_label").as("probe_label"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    broadcast(routed).join(c,
        col("label") === col("probe_label") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("probe_label"), col("vec_id"),
        round(cosine(col("qv"), col("v")), 9).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("q_id"), col("probe_label"), col("rk").cast("int").as("rk"),
        col("vec_id"), col("cos"))
      .orderBy("q_id", "rk")
  }
}
