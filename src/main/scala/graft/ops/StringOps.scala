package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{table => t}
import graft.TextFunctions

/** The reference's scalar-function surface (SURVEY.md §2.8) declared as
  * runnable queries over the harness tables (role mapping FIXTURES.md §3:
  * `p_name`/`p_type`/`p_brand` stand in for the legacy delimited-string
  * columns, `o_orderdate` for the datetimes, `events.props` for JSON
  * payloads).
  *
  * All of these are row-local projections — no shuffle, fully inside
  * whole-stage codegen (except the slug length-cap UDF, which runs on
  * already-normalized short strings) — so they scan-scale to 100 TB.
  */
object StringOps {

  /** SF1: fixcase — `Title`→`title`, `ACRONYM` unchanged (odgovlt.py:32-36).
    * `ul_input` is constructed Upper-lower so both branches fire. */
  def sf1Fixcase(s: SparkSession, dir: String): DataFrame = {
    val ul = concat(upper(substring(col("p_name"), 1, 1)),
      substring(col("p_name"), 2, Int.MaxValue))
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        TextFunctions.fixcase(ul).as("fixed_title"),
        TextFunctions.fixcase(upper(col("p_type"))).as("fixed_acronym"))
      .orderBy("p_partkey")
  }

  /** SF2/SF7: slug normalization chain (odgovlt.py:39-48) — transliterate,
    * strip non-word, trim, lower, collapse dashes. The id suffix mirrors
    * group-name derivation `slugify(title + ' ' + id)` (odgovlt.py:289-290). */
  def sf2SlugifyNorm(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        TextFunctions.slugifyNorm(
          concat_ws(" ", col("p_name"), col("p_brand"), col("p_partkey"))).as("slug"))
      .orderBy("p_partkey")

  /** SF3: slug length cap (odgovlt.py:50-69) — head/tail greedy packing,
    * not SQL-expressible; rows-only oracle + ScalaTest golden vector. */
  def sf3SlugTruncate(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        TextFunctions.slugify(
          concat_ws(" ", col("p_name"), col("p_type"), col("p_brand"),
            col("p_name"), col("p_type"), col("p_name")), 42).as("slug42"))
      .orderBy("p_partkey")

  /** SF4: tagify — collapse non-word runs to single spaces (odgovlt.py:74-76). */
  def sf4Tagify(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        TextFunctions.tagify(
          concat(col("p_name"), lit("!!"), col("p_brand"), lit("  "), col("p_type")))
          .as("tag"))
      .orderBy("p_partkey")

  /** SF5/F5/F6/A5: the full tag pipeline (odgovlt.py:79-94) via higher-order
    * array functions — `;`→`,`, split, trim, fixcase, drop empties,
    * tagify+lower, 2≤len≤100 — order-preserving, zero shuffles. */
  def sf5PackageTags(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        array_join(
          TextFunctions.packageTags(
            concat(col("p_name"), lit(";"), col("p_type"), lit(","),
              col("p_brand"), lit(", ,x,"), col("p_name"))),
          "|").as("tags"))
      .orderBy("p_partkey")

  /** P1/SF6: user projection — slug name + full-name concat
    * (odgovlt.py:186-194). */
  def p1UserProjection(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        TextFunctions.slugifyNorm(col("c_name")).as("name"),
        concat_ws(" ", col("c_name"), col("c_mktsegment")).as("fullname"))
      .orderBy("c_custkey")

  /** SF8: datetime → ISO-8601 string (odgovlt.py:131-140); NULL passthrough
    * is the zero-date path (zero dates map to NULL at the JDBC read). */
  def sf8DateFormat(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("iso_date"))
      .orderBy("o_orderkey")

  /** SF9/SF10/K1/K2: the gather→import queue round-trip — serialize each row
    * to JSON (odgovlt.py:363), parse it back (odgovlt.py:378), and project
    * the parsed fields. Oracle compares against the original columns, so the
    * round-trip must be lossless. */
  def sf9JsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "nation")
    val payload = n.select(
      col("n_nationkey").as("key"),
      to_json(struct(col("n_nationkey"), col("n_name"), col("n_regionkey")))
        .as("content"))
    val schema = "n_nationkey INT, n_name STRING, n_regionkey INT"
    payload
      .select(col("key"), from_json(col("content"), schema, Map.empty[String, String])
        .as("rec"))
      .select(
        col("key"),
        col("rec.n_name").as("n_name"),
        col("rec.n_regionkey").as("n_regionkey"))
      .orderBy("key")
  }

  /** SF10: JSON field extraction from a real JSON payload column. */
  def sf10JsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))
      .orderBy("event_id")

  /** P2/SF11: extras array-of-{key,value} structs → map → point lookups
    * (odgovlt.py:127-128, 231-240). */
  def sf11ExtrasMap(s: SparkSession, dir: String): DataFrame = {
    val extras = array(
      struct(lit("Kodas").as("key"), col("c_custkey").cast("string").as("value")),
      struct(lit("Adresas").as("key"), col("c_mktsegment").as("value")))
    t(s, dir, "customer")
      .withColumn("extras_map", map_from_entries(extras))
      .select(
        col("c_custkey"),
        element_at(col("extras_map"), "Kodas").as("kodas"),
        element_at(col("extras_map"), "Adresas").as("adresas"))
      .orderBy("c_custkey")
  }
}
