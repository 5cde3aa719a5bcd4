package graft.sources

import org.apache.spark.sql.DataFrame
import java.sql.{Connection, DriverManager, PreparedStatement}

/** K3/K4 production sinks: the reference upserts every package/user/org into
  * CKAN one REST call at a time (`/root/reference/odgovlt.py:205-211,
  * 249-257,407`); the engine's equivalent writes set-oriented results back
  * over JDBC.
  *
  * Three tiers, in preference order:
  *  1. compute the create/update/delete sets in Spark
  *     ([[graft.SyncPipeline.mergeActions]]) and apply each with a plain
  *     append/delete — pure connector writes, fully parallel;
  *  2. `upsert` below — INSERT .. ON DUPLICATE KEY UPDATE batched per
  *     partition for targets where the merge must be atomic per row;
  *  3. stage-and-MERGE: `df.write.jdbc` to a staging table + one server-side
  *     MERGE statement (best for targets with real MERGE support).
  *
  * Untestable in this container (no database); compile-checked code path
  * documenting the production contract. Partition-parallel: every executor
  * holds one connection and writes its partition in `batchSize` chunks.
  */
object JdbcSink {

  /** MySQL-dialect identifier quoting: schema-derived column names (and the
    * caller's table name) may be reserved words (`key`, `order`) or carry
    * non-plain characters — always quote, doubling embedded backticks.
    */
  private def q(ident: String): String =
    "`" + ident.replace("`", "``") + "`"

  /** Table names may be schema-qualified — quote each dotted part. */
  private def qTable(ident: String): String =
    ident.split('.').map(q).mkString(".")

  /** Plain append through the built-in connector (create-set application). */
  def append(df: DataFrame, url: String, table: String): Unit =
    df.write.mode("append").format("jdbc")
      .option("url", url).option("dbtable", table).save()

  /** Row-atomic upsert (MySQL dialect): INSERT ... ON DUPLICATE KEY UPDATE,
    * batched per partition. Key columns participate in the insert; update
    * applies to the non-key columns only, mirroring the reference's
    * patch-if-exists semantics.
    */
  def upsert(df: DataFrame, url: String, table: String, keyCols: Seq[String],
      batchSize: Int = 500): Unit = {
    val cols = df.schema.fieldNames.toSeq
    val updateCols = cols.filterNot(keyCols.contains)
    val sql = s"INSERT INTO ${qTable(table)} (${cols.map(q).mkString(", ")}) VALUES " +
      s"(${cols.map(_ => "?").mkString(", ")}) " +
      s"ON DUPLICATE KEY UPDATE ${updateCols.map(c => s"${q(c)} = VALUES(${q(c)})").mkString(", ")}"
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        val conn: Connection = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val st: PreparedStatement = conn.prepareStatement(sql)
          try {
            var n = 0
            rows.foreach { r =>
              cols.zipWithIndex.foreach { case (_, i) =>
                st.setObject(i + 1, r.get(i))
              }
              st.addBatch()
              n += 1
              if (n % batchSize == 0) { st.executeBatch(); conn.commit() }
            }
            st.executeBatch()
            conn.commit()
          } finally st.close()
        } finally conn.close()
      }
    }
  }

  /** Delete-set application (K5): one DELETE per key batch. */
  def deleteByKey(df: DataFrame, url: String, table: String, keyCol: String,
      batchSize: Int = 500): Unit = {
    val sql = s"DELETE FROM ${qTable(table)} WHERE ${q(keyCol)} = ?"
    df.select(keyCol).foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(sql)
          try {
            var n = 0
            rows.foreach { r =>
              st.setObject(1, r.get(0)); st.addBatch(); n += 1
              if (n % batchSize == 0) { st.executeBatch(); conn.commit() }
            }
            st.executeBatch(); conn.commit()
          } finally st.close()
        } finally conn.close()
      }
    }
  }
}
