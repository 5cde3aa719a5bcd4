package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hive-partitioned parquet layout management — the table layout the engine
  * assumes at scale, where the reference assumes one MySQL schema
  * (`/root/reference/README.rst:16-19`).
  *
  * Scale design: a 100 TB event table is only queryable if scans touch the
  * partitions a predicate names and writes touch the partitions a batch
  * contains. `write` lays the table out `dt=.../part-*.parquet` so Catalyst
  * turns `WHERE dt = X` into directory pruning (`PartitionFilters` in the
  * scan, zero I/O outside the named dates); `overwritePartitions` is the
  * incremental-sync write shape — a day's re-import atomically replaces that
  * day's directories and NEVER rewrites (or even lists the contents of) the
  * rest of the table. Contrast [[graft.streaming.StreamOps.incrementalSync]]
  * which swaps a whole unpartitioned directory: correct for dimension-sized
  * tables, ruinous for the fact table this sink owns.
  *
  * Partition columns should be low-cardinality derivations (a date, a type),
  * never a high-cardinality key: one directory per value is the layout's
  * cost model.
  */
object PartitionedStore {

  /** `events` with the derived daily partition column the layouts below
    * key on: the UTC date of `ts`, computed zone-free from epoch micros so
    * two environments with different session time zones agree on which
    * directory a row lives in (`to_date` would use the session zone).
    */
  def eventsWithDay(df: DataFrame): DataFrame =
    df.withColumn("dt", date_from_unix_date(
      floor(unix_micros(col("ts")) / lit(86400000000L)).cast("int")))

  /** Full (re)write of a partitioned layout. */
  def write(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.partitionBy(cols: _*).mode("overwrite").parquet(path)

  /** Replace ONLY the partitions present in `df` (dynamic partition
    * overwrite, scoped to this write, not the shared session conf): absent
    * partitions are untouched, present ones are atomically swapped. This is
    * upsert-at-partition-granularity — the batch form of the reference's
    * per-row `package_update` sweep, costed per changed day instead of per
    * table.
    */
  def overwritePartitions(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(cols: _*)
      .mode("overwrite")
      .parquet(path)
}
