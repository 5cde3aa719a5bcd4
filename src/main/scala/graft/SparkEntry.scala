package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.CoreOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` the DuckDB-equivalent ANSI SQL over the same parquet tables.
  * Determinism: every query ends in an explicit ORDER BY on a unique key,
  * mirrored in the oracle; aggregate/computed columns are aliased to the
  * same name on both sides; money sums go through integer cents.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreOps.j3BridgeGroups(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_s3_filtered_scan" -> (CoreOps.s3FilteredScan _),
    "q_s4_point_lookup" -> (CoreOps.s4PointLookup _),
    "q_s9_latest" -> (CoreOps.s9Latest _),
    "q_j1_left_defaults" -> (CoreOps.j1LeftDefaults _),
    "q_j2_dim_chain" -> (CoreOps.j2DimChain _),
    "q_j3_bridge_groups" -> (CoreOps.j3BridgeGroups _),
    "q_j6_semi" -> (CoreOps.j6Semi _),
    "q_j7_anti" -> (CoreOps.j7Anti _),
    "q_a1_distinct" -> (CoreOps.a1Distinct _),
    "q_a3_group_collect" -> (CoreOps.a3GroupCollect _),
    "q_a7_change_detect" -> (CoreOps.a7ChangeDetect _),
    "q_a8_group_stats" -> (CoreOps.a8GroupStats _),
    "q_so1_except" -> (CoreOps.so1Except _),
    "q_so2_union" -> (CoreOps.so2Union _),
    "q_w1_topk" -> (CoreOps.w1TopkPerGroup _),
  )

  /** DuckDB-runnable ANSI SQL equivalents (same result schema & order). */
  def oracleSql: Map[String, String] = Map(
    "q_s3_filtered_scan" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
         FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey""",
    "q_s4_point_lookup" ->
      """SELECT c_custkey, c_name, c_nationkey, c_mktsegment
         FROM customer WHERE c_custkey = 42""",
    "q_s9_latest" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, o_orderstatus
         FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1""",
    "q_j1_left_defaults" ->
      """SELECT o_orderkey,
                coalesce(c_name, 'Unknown User') AS owner_name,
                coalesce(c_mktsegment, 'UNKNOWN') AS owner_segment
         FROM orders
         LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 2 = 0) c
           ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "q_j2_dim_chain" ->
      """SELECT c_custkey, c_name,
                coalesce(n_name, 'Unknown organization') AS nation_name,
                coalesce(r_name, 'Unknown region') AS region_name
         FROM customer
         LEFT JOIN nation ON c_nationkey = n_nationkey
         LEFT JOIN region ON n_regionkey = r_regionkey
         ORDER BY c_custkey""",
    "q_j3_bridge_groups" ->
      """SELECT l_orderkey,
                array_to_string(list_sort(list(DISTINCT p_name)), '|') AS groups,
                count(DISTINCT p_name) AS n_groups
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY l_orderkey ORDER BY l_orderkey""",
    "q_j6_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_j7_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "q_a1_distinct" ->
      """SELECT DISTINCT c_mktsegment AS segment FROM customer ORDER BY segment""",
    "q_a3_group_collect" ->
      """SELECT n_regionkey,
                string_agg(n_name, '|' ORDER BY n_name) AS members,
                count(*) AS n_members
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "q_a7_change_detect" ->
      """WITH old AS (SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders),
              neu AS (SELECT o_orderkey AS n_orderkey, o_orderstatus AS n_status,
                             CASE WHEN o_orderkey % 10 = 0 THEN '0-CHANGED'
                                  ELSE o_orderpriority END AS n_priority
                      FROM orders)
         SELECT o_orderkey, n_priority AS new_priority
         FROM old JOIN neu ON o_orderkey = n_orderkey
         WHERE o_orderstatus <> n_status OR o_orderpriority <> n_priority
         ORDER BY o_orderkey""",
    "q_a8_group_stats" ->
      """SELECT o_orderpriority,
                count(*) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
                count(DISTINCT o_custkey) AS n_customers
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_so1_except" ->
      """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
         EXCEPT
         SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
         ORDER BY k""",
    "q_so2_union" ->
      """SELECT DISTINCT k FROM (
           SELECT CAST(c_nationkey AS INT) AS k FROM customer
           UNION ALL
           SELECT CAST(s_nationkey AS INT) AS k FROM supplier)
         ORDER BY k""",
    "q_w1_topk" ->
      """SELECT c_nationkey, CAST(rk AS INT) AS rk, c_custkey, c_acctbal FROM (
           SELECT c_nationkey, c_custkey, c_acctbal,
                  ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                     ORDER BY c_acctbal DESC, c_custkey) AS rk
           FROM customer)
         WHERE rk <= 3 ORDER BY c_nationkey, rk""",
  )
}
