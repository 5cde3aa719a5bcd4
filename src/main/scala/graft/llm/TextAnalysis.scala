package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{table => t}
import TextHash._

/** Text-analysis operators over the `documents` table (SURVEY.md §2.11):
  * quality scoring, token counting (whitespace + BPE-ish subword estimate),
  * marker-based language ID, and an order-sensitive document fingerprint.
  *
  * All row-local `Column` pipelines — zero shuffles, scan-speed at 100 TB;
  * ratios are exact integer divisions in double (identical in any engine).
  */
object TextAnalysis {

  private val stopwords = Seq("the", "a", "of", "and")

  /** Marker vocab per language for the n-gram-heuristic language ID
    * (deterministic stand-in for a char-n-gram model; the harness corpus is
    * a closed 31-word vocabulary).
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "de" -> Seq("window", "batch", "group"),
    "en" -> Seq("the", "a", "data"),
    "es" -> Seq("query", "row", "filter"),
    "fr" -> Seq("table", "line", "merge"),
    "zh" -> Seq("vector", "stream", "hash"))

  private def markerScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, w => w.isin(markers.map(x => x: Any): _*)))

  /** Quality/statistics profile per document. */
  def stats(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    t(s, dir, "documents")
      .withColumn("toks", toks)
      .select(
        col("doc_id"),
        size(col("toks")).cast("int").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("int").as("n_types"),
        // BPE-ish subword estimate: ceil(len/4) pieces per word
        aggregate(col("toks"), lit(0L),
          (acc, w) => acc + ((length(w) + 3) / 4).cast("long"))
          .cast("bigint").as("n_subwords"),
        round(size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")).cast("double"), 6).as("ttr"),
        round(size(filter(col("toks"), w => w.isin(stopwords.map(x => x: Any): _*)))
          .cast("double") / size(col("toks")).cast("double"), 6).as("stop_ratio"))
      .orderBy("doc_id")
  }

  /** Language ID: argmax of marker-hit counts, ties broken alphabetically
    * (first-match CASE over langs in sorted order — same rule in the oracle).
    */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      lang -> markerScore(col("toks"), markers)
    }
    val smax = greatest(scores.map(_._2): _*)
    val pred = scores.tail.foldLeft(
      when(scores.head._2 === smax, scores.head._1)) {
      case (acc, (lang, sc)) => acc.when(sc === smax, lang)
    }
    t(s, dir, "documents")
      .withColumn("toks", toks)
      .select(
        col("doc_id"), col("lang").as("labeled_lang"),
        pred.as("pred_lang"), smax.cast("int").as("score"))
      .orderBy("doc_id")
  }

  /** Order-sensitive rolling-hash fingerprint per document. */
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), fingerprint(tokens(col("text"))).as("fp"))
      .orderBy("doc_id")
}
