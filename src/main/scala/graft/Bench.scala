package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query at the given scale factor and
  * prints one JSON line. Queries are materialized through the noop sink —
  * unlike count(), noop forces evaluation of every projected column, so the
  * timing covers the real work (string pipelines, hashes, dot products).
  *
  * Each query is executed `SPARK_GRAFT_BENCH_RUNS` times (default 3) at the
  * bench SF; the reported per-query number is the MEDIAN of those runs and
  * the MIN is reported alongside ("queries_min"). Rationale (round-4/5
  * verdicts): a warmup pass at a smaller SF does not warm what is timed —
  * AQE/broadcast decisions differ by scale, so the first run at the bench
  * SF still pays cold whole-stage-codegen compilation (measured ~8 s on the
  * JSON-heavy plan). The median reports steady-state while keeping
  * single-run GC spikes out of round-over-round comparisons; the min is the
  * load-robust statistic for a fixed workload — under sustained host load
  * every run inflates roughly uniformly (round 5 recorded a uniform ~3×),
  * and the min of N is the least-contaminated sample. The machine's
  * /proc/loadavg is recorded before and after the run ("loadavg") so a
  * contaminated record is detectable from the JSON alone.
  *
  * A run that THROWS is recorded as null in "runs" and excluded from the
  * median/min — a fast failure must never read as a speedup. Queries with
  * any failed run are listed in "failed" (name → failure count); a query
  * whose every run failed reports null in "queries"/"queries_min", and the
  * headline "value" itself becomes null — a completely broken query must
  * not shrink the total and read as a round-over-round improvement.
  *
  * `SPARK_GRAFT_BENCH_ONLY` (csv of query names) restricts the run to a
  * subset — the per-operator iteration loop; the headline total then
  * covers only that subset.
  *
  * After the per-query phase, the INDEX-FAMILY split phase ([[BenchSplits]])
  * times each build group once (artifacts written to parquet — the at-rest
  * form), then times the probe halves over the frozen artifacts for the
  * same `nRuns`: "artifact_builds" (group → one-shot build+freeze sec) and
  * "probes"/"probes_min" (query → serving cost) land in the same JSON
  * line. The declared per-query numbers are untouched — the split phase
  * only makes the build-once/probe-many economics visible.
  */
object Bench {

  /** The JDK-17 module packages Spark needs opened when a JVM is launched
    * outside spark-submit (which injects them itself). ONE list for every
    * fork site — the local-cluster executor command line here and the
    * at-rest probe JVM in BenchSplitSpec — so a Spark upgrade that needs
    * one more open can't half-land.
    */
  val Jdk17OpenPackages: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ").take(3).mkString(" ")
    catch { case _: Throwable => "" }

  def main(args: Array[String]): Unit = {
    // read ambient load FIRST: SparkSession startup itself spins every
    // core for seconds and pushes the 1-min average toward ~1, so a
    // post-startup read reports the bench's own launch as contamination
    val loadBefore = loadavg()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // SPARK_GRAFT_MASTER=local-cluster[4,8,2048] runs the MULTI-JVM tier:
    // separate executor processes, so closure serialization, broadcast
    // shipping and remote shuffle fetch are real (local[n] shares one JVM
    // and hides all three). Executor JVMs need our classes + the JDK-17
    // module opens on their own command line — forward both.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder0 = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
    val builder =
      if (!master.startsWith("local-cluster")) builder0
      else builder0
        .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
        .config("spark.executor.extraJavaOptions",
          Jdk17OpenPackages.map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" "))
    val spark = builder
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // harness tables are single small parquet files; without a lower
      // split size every scan is one task and the cores idle until the
      // first shuffle (a cluster run has many files and keeps the default)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JVM + parquet footer listing, so startup cost is not
    // attributed to the alphabetically-first query
    Tables.names.foreach { n =>
      try Tables.table(spark, sfDir, n).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    def numOrNull(v: Option[Double]): String = v.map(d => f"$d%.3f").getOrElse("null")
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    def selected(name: String): Boolean = only.isEmpty || only(name)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => selected(name) }
      .map { case (name, fn) =>
      val runs: Seq[Option[Double]] = (1 to nRuns).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // per-query caches must not leak memory pressure into later runs,
        // and GC debt from unpersisted blocks must not land inside a later
        // query's timed window (cleanup runs OUTSIDE the timing)
        spark.catalog.clearCache()
        System.gc()
        if (ok) Some(elapsed) else None
      }
      val good = runs.flatten
      // one compact line per query AS IT COMPLETES (driver contract,
      // round-13 verdict item 2): the full per-query map below is tens of
      // KB and falls outside the driver's bounded stdout capture, so
      // PERF_r{12,13}.json recorded per_query = {}. A whole-stdout parser
      // recovers the map from these lines; a tail capture still gets the
      // compact total. Median + min, same statistics as the big line.
      println(f"""{"q":"$name","sec":${numOrNull(
        good.headOption.map(_ => median(good)))},"min":${numOrNull(
        good.minOption)}}""")
      (name, good.headOption.map(_ => median(good)), good.minOption, runs)
    }
    // ---- index-family build/probe split (BenchSplits) ----
    val splitQueries = BenchSplits.probes.keys.filter(selected).toSeq.sorted
    val neededGroups = splitQueries.map(BenchSplits.probes(_).group).distinct
    val frozenDir = java.nio.file.Files
      .createTempDirectory("graft_bench_idx").toString
    val buildSecs = neededGroups.map { g =>
      val t0 = System.nanoTime()
      val ok = try {
        BenchSplits.builds(g)(spark, sfDir).foreach { case (art, df) =>
          df.write.mode("overwrite").parquet(s"$frozenDir/$art")
        }
        true
      } catch { case e: Throwable =>
        System.err.println(s"[bench] build $g failed: ${e.getMessage}")
        false
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      (g, if (ok) Some(elapsed) else None)
    }
    val builtGroups = buildSecs.collect { case (g, Some(_)) => g }.toSet
    def art(name: String) = spark.read.parquet(s"$frozenDir/$name")
    // every selected probe gets a row: a probe whose BUILD failed reports
    // null with failure count -1 ("never attempted" — emitted as
    // "probe:<q>":"skipped" so downstream can tell it from n attempted
    // runs that failed; the build:<g> entry carries the root cause).
    // An absent key would read downstream as "not run" while the truth
    // is "broken" (same convention as the main phase, where breakage
    // must never shrink the totals)
    val probeResults = splitQueries.map { q =>
      if (!builtGroups(BenchSplits.probes(q).group)) (q, None, None, -1)
      else {
        val runs = (1 to nRuns).map { _ =>
          val t0 = System.nanoTime()
          val ok =
            try {
              BenchSplits.probes(q).run(spark, sfDir, art)
                .write.format("noop").mode("overwrite").save()
              true
            } catch { case e: Throwable =>
              System.err.println(s"[bench] probe $q failed: ${e.getMessage}")
              false
            }
          val elapsed = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          System.gc()
          if (ok) Some(elapsed) else None
        }
        val good = runs.flatten
        // same one-line-per-query contract as the main phase
        println(f"""{"q":"probe:$q","sec":${numOrNull(
          good.headOption.map(_ => median(good)))},"min":${numOrNull(
          good.minOption)}}""")
        (q, good.headOption.map(_ => median(good)), good.minOption,
          runs.count(_.isEmpty))
      }
    }
    // the frozen artifacts are corpus-sized (posting tables, two IVFPQ
    // index triples) — delete them, or every bench session leaks a
    // graft_bench_idx* tree into /tmp until something reaps it
    def rmTree(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rmTree)
      f.delete(): Unit
    }
    rmTree(new java.io.File(frozenDir))

    val qs = results.map { case (k, p50, _, _) => "\"" + k + "\":" + numOrNull(p50) }
      .mkString("{", ",", "}")
    val qsMin = results.map { case (k, _, mn, _) => "\"" + k + "\":" + numOrNull(mn) }
      .mkString("{", ",", "}")
    val runsJson = results.map { case (k, _, _, rs) =>
      "\"" + k + "\":" + rs.map(numOrNull).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // split-phase breakage feeds the same failed map as the main phase:
    // probe failures as "probe:<q>" (count of attempted-and-failed runs,
    // or "skipped" when the build failure meant zero probe runs were
    // attempted), build failures as "build:<g>"
    val failedEntries =
      results.collect { case (k, _, _, rs) if rs.exists(_.isEmpty) =>
        "\"" + k + "\":" + rs.count(_.isEmpty)
      } ++
      buildSecs.collect { case (g, None) => "\"build:" + g + "\":1" } ++
      probeResults.collect {
        case (q, _, _, nf) if nf > 0 => "\"probe:" + q + "\":" + nf
        case (q, _, _, nf) if nf < 0 => "\"probe:" + q + "\":\"skipped\""
      }
    val failed = failedEntries.mkString("{", ",", "}")
    // a query with zero successful runs poisons the headline: a total that
    // silently omits it would report breakage as a speedup
    val totalStr =
      if (results.exists(_._2.isEmpty)) "null"
      else f"${results.flatMap(_._2).sum}%.3f"
    val buildsJson = buildSecs.map { case (g, v) => "\"" + g + "\":" + numOrNull(v) }
      .mkString("{", ",", "}")
    val probesJson = probeResults.map { case (q, p50, _, _) => "\"" + q + "\":" + numOrNull(p50) }
      .mkString("{", ",", "}")
    val probesMinJson = probeResults.map { case (q, _, mn, _) => "\"" + q + "\":" + numOrNull(mn) }
      .mkString("{", ",", "}")
    // ---- streaming throughput tier (BenchStreaming) ----
    // Runs in a FORKED JVM after the query section is fully measured and
    // its closing loadavg recorded: the round-10 driver pass ran both
    // tiers in one process and the streaming load (5-min loadavg 4.6 →
    // 36.6 across the run) drifted the per-query minima 1.1–1.4×, making
    // round-over-round regression detection undecidable from the driver
    // artifact alone. The fork gives the query section a quiet start AND
    // a quiet end ("loadavg.after_queries"), and the streaming tier its
    // own fresh JVM (no shared heap/GC history with 191 timed queries).
    // A broken twin records itself under its name; a broken PHASE (or a
    // failed fork) records an error object — either way the batch
    // numbers above stay intact.
    val loadAfterQueries = loadavg()
    val streamingJson =
      if (sys.env.get("SPARK_GRAFT_BENCH_SKIP_STREAMING").contains("1"))
        """{"skipped":true}"""
      else if (only.nonEmpty) """{"skipped":"subset run"}"""
      else {
        val tmp = java.nio.file.Files.createTempFile("bench_streaming", ".json")
        try {
          val addOpens = Jdk17OpenPackages
            .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
          // the fork mirrors the batch session's scan parallelism
          // (maxPartitionBytes) so streaming throughput is measured under
          // the SAME split sizing as the query section it's compared
          // against; -Xmx8g bounds the fork because the parent JVM (sbt
          // or the driver harness) keeps its own multi-GB heap alive and
          // the two would otherwise contend for the box
          val cmd = Seq(
            s"${System.getProperty("java.home")}/bin/java") ++ addOpens ++ Seq(
            "-Xmx8g", "-cp", System.getProperty("java.class.path"),
            "-Dspark.ui.enabled=false",
            "-Dspark.sql.session.timeZone=UTC",
            "-Dspark.sql.files.maxPartitionBytes=4m",
            "graft.BenchStreaming")
          val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
          pb.environment().put("SPARK_GRAFT_STREAMBENCH_OUT", tmp.toString)
          // RAW: the fork writes the BARE streaming object to the tmp
          // file (no wrapper), so it embeds verbatim — no marker-string
          // extraction that a twin or sfDir containing the marker text
          // could defeat
          pb.environment().put("SPARK_GRAFT_STREAMBENCH_RAW", "1")
          val proc = pb.start()
          val log = new String(proc.getInputStream.readAllBytes())
          val exit = proc.waitFor()
          if (exit != 0)
            sys.error(s"streaming JVM exited $exit: ${log.takeRight(300)}")
          val obj = new String(java.nio.file.Files.readAllBytes(tmp)).trim
          if (!(obj.startsWith("{") && obj.endsWith("}")))
            sys.error(s"no streaming object in: ${obj.take(200)}")
          obj
        }
        catch { case e: Throwable =>
          System.err.println(s"[bench] streaming phase failed: ${e.getMessage}")
          // truncate the RAW message, then escape: cutting after escaping
          // can split a doubled backslash and leave a dangling escape that
          // poisons the closing JSON quote
          s"""{"error":"${BenchStreaming.esc(
            Option(e.getMessage).getOrElse(e.getClass.getName).take(200))}"}"""
        }
        finally java.nio.file.Files.deleteIfExists(tmp)
      }
    val loadAfter = loadavg()
    // the COMPACT headline: everything a round-over-round comparison
    // needs, small enough (<250 chars) to survive a bounded stdout
    // capture. The driver keeps only a tail of bench stdout and the full
    // per-query line below is tens of KB, so BENCH_r{N}.json recorded
    // `parsed: null` two rounds running — printing the compact line BOTH
    // first (a whole-stdout parser hits it before the big line) and last
    // (a tail capture retains it) makes the driver artifact
    // self-contained whichever end survives; the two lines are identical
    // so any parser that keeps first/last/any match records the same
    // totals.
    val nQueries = results.size
    val nFailed = results.count(_._2.isEmpty)
    val compact =
      f"""{"metric":"total","value":$totalStr,"unit":"sec","n_queries":$nQueries,"n_failed":$nFailed,"runs_per_query":$nRuns,"loadavg":{"before":"$loadBefore","after_queries":"$loadAfterQueries","after":"$loadAfter"},"sf":"$sfDir"}"""
    val line =
      f"""{"metric":"total","value":$totalStr,"unit":"sec","queries":$qs,"queries_min":$qsMin,"runs":$runsJson,"failed":$failed,"runs_per_query":$nRuns,"artifact_builds":$buildsJson,"probes":$probesJson,"probes_min":$probesMinJson,"streaming":$streamingJson,"loadavg":{"before":"$loadBefore","after_queries":"$loadAfterQueries","after":"$loadAfter"},"sf":"$sfDir"}"""
    println(compact)
    println(line)
    println(compact)
    // stdout runs through sbt's [info] prefix, which breaks line-oriented
    // JSON parsing downstream — always ALSO write the bare line to a file
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
