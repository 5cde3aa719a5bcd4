package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main for the PRODUCTION extract path (S1/S2): a partitioned
  * JDBC read of the sf fact table out of embedded Derby, measured against
  * the parquet scan of the same rows — the number the round-10 verdict
  * noted was spec-tested but never benched.
  *
  * What it measures, one JSON line:
  *  - `load_sec` — one-time Spark→Derby load of `lineitem` (batched
  *    INSERTs; not the comparison subject, recorded for context);
  *  - `parquet_agg_sec` / `jdbc_single_sec` / `jdbc_part_sec` — the same
  *    aggregation (per-returnflag COUNT + exact-cents SUM) over the three
  *    scan paths: parquet, 1-connection JDBC, and the
  *    [[graft.sources.JdbcTables.partitionedTable]] path with
  *    `SPARK_GRAFT_CPUS`-way PK-range splits;
  *  - `jdbc_part_speedup` — single ÷ partitioned wall-clock: the figure
  *    that justifies the partitioned-extract design (the reference reads
  *    row-at-a-time over ONE connection, odgovlt.py:363);
  *  - `pushdown_ok` — whether a `l_quantity < 5` probe's physical plan
  *    carries the predicate INTO the JDBC scan (`PushedFilters`), i.e.
  *    the remote engine filters before rows cross the wire, plus the
  *    probe row count so the filter is visibly selective.
  *
  * Derby stands in for MySQL as in JdbcSpec (the container's only JDBC
  * engine; same Spark JDBC code path, dialect aside). Embedded Derby is
  * JVM-local, so this bench runs under local[n] only — each of the N
  * range partitions still opens its own connection and the scan
  * parallelism is real; what Derby can't show is network transfer, which
  * would only widen the partitioned path's advantage.
  */
object BenchJdbc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val dbDir = sys.env.getOrElse("SPARK_GRAFT_JDBC_DB", "/tmp/graft-jdbc-bench")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val url = s"jdbc:derby:$dbDir/db;create=true"
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val li = Tables.table(spark, sfDir, "lineitem")
    val (bounds, _) = timed {
      li.agg(min(col("l_orderkey")), max(col("l_orderkey"))).head()
    }
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val nRows = li.count()

    // one-time load (overwrite a fresh Derby table; batched INSERTs)
    val (_, loadSec) = timed {
      li.write.mode("overwrite")
        .option("batchsize", "5000")
        .jdbc(url, "LINEITEM", new java.util.Properties)
    }

    def agg(df: DataFrame): DataFrame =
      df.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"),
          sum((col("l_extendedprice") * 100).cast("long")).as("cents"))
        .orderBy("l_returnflag")

    // the agreement check compares the FULL agg rows (flag, cnt, exact
    // cents) — a count-only compare would wave through value corruption
    // in the Derby round-trip (decimal mangling, truncated doubles)
    def consume(df: DataFrame): Seq[(String, Long, Long)] =
      agg(df).collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    val jt = new graft.sources.JdbcTables(spark, url)
    val (parquetAgg, parquetSec) = timed(consume(li))
    val (singleAgg, singleSec) = timed(consume(jt.table("LINEITEM")))
    val (partAgg, partSec) = timed(consume(
      jt.partitionedTable("LINEITEM", "l_orderkey", lo, hi + 1, cpus)))
    require(parquetAgg == singleAgg && singleAgg == partAgg,
      s"extract paths disagree:\n parquet=$parquetAgg\n single=$singleAgg\n part=$partAgg")

    // pushdown probe: the predicate must reach the JDBC scan node
    val probe = jt.partitionedTable("LINEITEM", "l_orderkey", lo, hi + 1, cpus)
      .filter(col("l_quantity") < 5)
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = probe.queryExecution.executedPlan.toString
    val pushed = plan.contains("PushedFilters") && plan.contains("l_quantity")
    val (probeRows, _) = timed(probe.count())

    val line =
      f"""{"metric":"jdbc_extract","sf":"$sfDir","rows":$nRows,"load_sec":$loadSec%.2f,"parquet_agg_sec":$parquetSec%.2f,"jdbc_single_sec":$singleSec%.2f,"jdbc_part_sec":$partSec%.2f,"jdbc_part_speedup":${singleSec / partSec}%.2f,"partitions":$cpus,"pushdown_ok":$pushed,"probe_rows":$probeRows}"""
    println(line)
    println("[benchjdbc] pushdown plan:\n" + plan.linesIterator.take(8).mkString("\n"))
    val out = sys.env.getOrElse("SPARK_GRAFT_JDBCBENCH_OUT", "bench_jdbc.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
