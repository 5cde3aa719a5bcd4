package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1/S2: the JDBC twin of the Parquet loaders — schema reflection from the
  * live database catalog, mirroring the reference's `meta.reflect()`
  * (`/root/reference/odgovlt.py:147-148`) and its five-table registry
  * (`/root/reference/odgovlt.py:149-156`).
  *
  * Spark's JDBC source infers schemas from remote metadata on `load()`, so
  * "reflection" is free; nothing is hard-coded but table names.
  *
  * Scale notes:
  *  - dimension tables (users/orgs/categories/bridge) are single-partition
  *    reads — they are catalog-sized and feed broadcast joins;
  *  - the fact table (`t_rinkmena`) reads partitioned on its PK so the scan
  *    parallelizes across executors (`partitionColumn`/`numPartitions`);
  *  - predicates pushed by Catalyst reach the remote WHERE clause
  *    (e.g. the `STATUSAS = 'U'` filter runs in MySQL, SURVEY.md §4.1);
  *  - MySQL zero-dates (`0000-00-00 00:00:00`) must surface as NULL —
  *    the reference special-cases them (`/root/reference/odgovlt.py:137-138`);
  *    with Connector/J that is the `zeroDateTimeBehavior=convertToNull`
  *    URL parameter, appended to MySQL/MariaDB URLs if absent (other
  *    drivers reject unknown attributes and have no zero-date concept).
  *
  * Reflection, partitioned-read, and pushdown semantics are exercised
  * end-to-end against embedded Derby in JdbcSpec; the MySQL-specific
  * zero-date guard is pin-tested on the URL builder (no MySQL server in
  * the harness).
  */
final class JdbcTables(spark: SparkSession, url: String) {

  private val fixedUrl = JdbcTables.withZeroDateGuard(url)

  /** Reflected read of one table (dimension-sized: single partition). */
  def table(name: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", fixedUrl)
      .option("dbtable", name)
      .load()

  /** Partitioned read of a large table, split on an integral column. */
  def partitionedTable(name: String, partitionColumn: String,
      lowerBound: Long, upperBound: Long, numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", fixedUrl)
      .option("dbtable", name)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()

  /** The reference's table registry (odgovlt.py:149-156). */
  def user: DataFrame = table("t_user")
  def istaiga: DataFrame = table("t_istaiga")
  def kategorija: DataFrame = table("t_kategorija")
  def kategorijaRinkmena: DataFrame = table("t_kategorija_rinkmena")

  /** The dataset fact table, partitioned on ID for parallel extraction. */
  def rinkmena(numPartitions: Int = 32, maxId: Long = 1L << 20): DataFrame =
    partitionedTable("t_rinkmena", "ID", 0L, maxId, numPartitions)
}

object JdbcTables {
  /** Append `zeroDateTimeBehavior=convertToNull` to MySQL-family URLs only
    * (the reference's zero-date → NULL contract, odgovlt.py:137-138).
    */
  def withZeroDateGuard(url: String): String =
    if (!url.startsWith("jdbc:mysql:") && !url.startsWith("jdbc:mariadb:")) url
    else if (url.contains("zeroDateTimeBehavior")) url
    else url + (if (url.contains("?")) "&" else "?") + "zeroDateTimeBehavior=convertToNull"
}
