package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4 scale notes). AQE's skew-join
  * handling covers sort-merge joins at runtime; these cover the cases AQE
  * does not: hash aggregations over hot keys and broadcast-averse joins
  * where one key dominates.
  *
  * Both transformations preserve results exactly — they only change the
  * partitioning of intermediate state.
  */
object SkewOps {

  /** Salted equi-join: the probe side scatters each row to one of `salt`
    * sub-keys; the build side replicates every row to all `salt` sub-keys.
    * A single hot key then lands on `salt` reducers instead of one.
    * The salt is `rand(seed)`-derived — deterministic per seed, and the
    * join result is identical to the unsalted join regardless of salt.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, salt: Int, seed: Long = 42L): DataFrame = {
    val saltedProbe = probe.withColumn("__salt",
      (F.rand(seed) * salt).cast("int"))
    val saltedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedProbe.join(saltedBuild,
        saltedProbe(probeKey) === saltedBuild(buildKey) &&
          saltedProbe("__salt") === saltedBuild("__salt"))
      .drop("__salt")
  }

  /** Two-phase (salted) aggregation: partial aggregate on (key, salt), then
    * final aggregate on key — bounds any single reducer's input to
    * 1/salt of the hottest key. Catalyst's map-side partial aggregation
    * already gives this within a task; the explicit salt handles the
    * reducer-side hot spot that partials can't.
    */
  def saltedCount(df: DataFrame, key: String, salt: Int, seed: Long = 42L): DataFrame =
    df.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))

  /** Null-flood-safe left join: a nullable probe key sends every null row
    * to ONE reducer under hash partitioning — the third classic skew trap
    * beside hot keys (joins/aggs above). Null keys can never match, so
    * the fix is algebraic: route only `IS NOT NULL` rows through the
    * join's exchange and union the null rows back with null-extended
    * build columns — result identical to the plain left join, null flood
    * structurally impossible (the join input carries an isnotnull
    * filter; PlanSpec pins it).
    *
    * Precondition (checked loudly): probe and build column names must be
    * DISJOINT — a shared name would make the join condition ambiguous and
    * the null-extension overwrite a probe column (the same class of input
    * contract as [[saltedStats]]'s integral-sum requirement).
    */
  def nullSkewLeftJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String): DataFrame = {
    val shared = probe.columns.toSet.intersect(build.columns.toSet)
    require(shared.isEmpty,
      s"nullSkewLeftJoin requires disjoint schemas; shared: ${shared.mkString(", ")}")
    val joined = probe.filter(col(probeKey).isNotNull)
      .join(build, col(probeKey) === col(buildKey), "left_outer")
    val nullExtended = build.columns.foldLeft(
      probe.filter(col(probeKey).isNull)) { (df, c) =>
      df.withColumn(c, lit(null).cast(build.schema(c).dataType))
    }
    joined.unionByName(nullExtended)
  }

  /** [[saltedCount]] widened to count + sum — the declared-query form
    * (`q_skew_agg`). The summed column must be INTEGRAL (cents, counts):
    * integer re-aggregation is order-insensitive, so the salted result is
    * bit-identical to the unsalted one on any engine — a salted DOUBLE sum
    * would reorder additions and drift in the last ulp.
    */
  def saltedStats(df: DataFrame, key: String, valueCol: String, salt: Int,
      seed: Long = 42L): DataFrame =
    df.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("s"))

  /** Hash salt prefixing every bloom-join key (mirrored in the oracle-free
    * spec; the result is key-transparent so no oracle sees it).
    */
  private val BloomJoinSalt = "bj:"

  private def bloomKey(key: org.apache.spark.sql.Column) =
    graft.llm.TextHash.md5Long(concat(lit(BloomJoinSalt), key.cast("string")))

  /** Runtime-filter join: when the build side is too big to broadcast but
    * its BLOOM isn't (16 KB vs GBs — the regime every star-schema join at
    * 100 TB lives in once the dim outgrows `autoBroadcastJoinThreshold`),
    * ship the bloom of the build keys to the probe scan and drop
    * non-matching fact rows BEFORE the shuffle: the exchange then carries
    * only (matches + bloom false positives) instead of the whole fact
    * table. The exact equi-join afterwards removes the false positives,
    * so the result is IDENTICAL to the plain join — the bloom only
    * changes what the shuffle carries (the saltedJoin contract). This is
    * the manual form of the runtime-filter/DPP family Spark applies to
    * partition columns; here it works on arbitrary keys.
    *
    * The probe predicate is the codegen'd [[graft.functions.BloomContains]]
    * — scan-speed, the decontamination economics applied to a join.
    */
  def bloomJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, bits: Int = 1 << 17, hashes: Int = 5): DataFrame = {
    import graft.functions.{BloomBuild, BloomContains}
    // same guard discipline as asofJoin: shared column names would make
    // col(probeKey) === col(buildKey) ambiguous or duplicate outputs, and
    // the internal bloom column must not shadow a user column
    val shared = probe.columns.toSet.intersect(build.columns.toSet)
    require(shared.isEmpty,
      s"bloomJoin requires disjoint schemas; shared: ${shared.mkString(", ")}" +
        " — rename one side's columns first")
    require(!probe.columns.contains("__bits") && !probe.columns.contains("__h")
      && !build.columns.contains("__bits") && !build.columns.contains("__h"),
      "bloomJoin reserves the __bits/__h column names")
    val bloom = build
      .select(bloomKey(col(buildKey)).as("__h"))
      .agg(BloomBuild(col("__h"), bits, hashes).as("__bits"))
    probe
      .crossJoin(broadcast(bloom))
      .filter(BloomContains(col("__bits"), bloomKey(col(probeKey))))
      .drop("__bits")
      .join(build, col(probeKey) === col(buildKey))
  }
}
