package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, Driver, DriverManager, PreparedStatement}
import java.util.Properties
import java.util.concurrent.ConcurrentHashMap
import java.util.logging.Logger
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Test-only JDBC driver that EXECUTES the MySQL dialect statements
  * ([[graft.sources.JdbcSink.MySqlDialect]]) against an in-memory store
  * with MySQL's documented ON DUPLICATE KEY semantics — the same
  * stand-in-engine move JdbcSpec makes with Derby for the ANSI-MERGE
  * dialect, for the statement family Derby cannot parse.
  *
  * Implements exactly what the sink's write path touches (getConnection,
  * setAutoCommit, prepareStatement, setObject, addBatch, executeBatch,
  * executeUpdate, commit, close) via reflective proxies; any other JDBC
  * call fails loudly so silent semantic gaps cannot hide.
  *
  * Tables are declared up front with their unique key (the information a
  * real MySQL reads from DDL); `ON DUPLICATE KEY UPDATE` then applies
  * assignment-by-assignment: `c = VALUES(c)` takes the incoming value,
  * a self-assignment `k = k` keeps the existing row (the sink's
  * insert-if-absent form).
  */
object FakeMySql {
  val UrlPrefix = "jdbc:fakemysql:"

  final case class Table(cols: Seq[String], keyCols: Seq[String],
      rows: mutable.LinkedHashMap[Seq[Any], mutable.Map[String, Any]])

  private val tables = new ConcurrentHashMap[String, Table]()
  val statements = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def reset(): Unit = { tables.clear(); statements.clear() }

  def createTable(name: String, cols: Seq[String], keyCols: Seq[String]): Unit =
    tables.put(name, Table(cols, keyCols, mutable.LinkedHashMap.empty))

  def rows(name: String): Seq[Map[String, Any]] =
    tables.get(name).rows.synchronized {
      tables.get(name).rows.values.map(_.toMap).toSeq
    }

  private def unquote(ident: String): String = ident.trim.stripPrefix("`").stripSuffix("`")

  private val UpsertRx =
    """(?s)INSERT INTO (\S+) \((.+?)\) VALUES \((.+?)\) ON DUPLICATE KEY UPDATE (.+)""".r
  private val DeleteRx = """DELETE FROM (\S+) WHERE (\S+) = \?""".r
  private val ValuesAssignRx = """(\S+) = VALUES\((\S+)\)""".r
  private val SelfAssignRx = """(\S+) = (\S+)""".r

  /** Parse-once statement executor: runs one bound parameter row. */
  type Exec = Seq[Any] => Unit

  def compile(sql: String): Exec = {
    statements.add(sql)
    sql match {
      case UpsertRx(table, colList, _, assignList) =>
        val name = unquote(table)
        val cols = colList.split(",").map(unquote).toSeq
        val assigns = assignList.split(",").map(_.trim).map {
          case ValuesAssignRx(l, r) =>
            val (lc, rc) = (unquote(l), unquote(r))
            require(lc == rc, s"unsupported cross-column VALUES assignment: $sql")
            Left(lc) // take the incoming value
          case SelfAssignRx(l, r) if unquote(l) == unquote(r) =>
            Right(unquote(l)) // keep the existing value
          case other => sys.error(s"unsupported assignment '$other' in: $sql")
        }.toSeq
        val t = tables.get(name)
        require(t != null, s"table $name not declared via FakeMySql.createTable")
        require(cols == t.cols, s"column mismatch: stmt=$cols table=${t.cols}")
        params => {
          val row = cols.zip(params).toMap
          val key = t.keyCols.map(row)
          t.rows.synchronized {
            t.rows.get(key) match {
              case Some(existing) =>
                assigns.foreach {
                  case Left(c) => existing(c) = row(c)
                  case Right(_) => // self-assignment: no-op
                }
              case None =>
                t.rows.put(key, mutable.Map(row.toSeq: _*))
            }
          }
        }
      case DeleteRx(table, col) =>
        val name = unquote(table)
        val c = unquote(col)
        val t = tables.get(name)
        require(t != null, s"table $name not declared via FakeMySql.createTable")
        params => t.rows.synchronized {
          t.rows.filterInPlace((_, row) => row(c) != params.head)
        }
      case other => sys.error(s"fake MySQL cannot parse: $other")
    }
  }

  // --- reflective JDBC surface -------------------------------------------

  private def proxy[T](iface: Class[T])(h: (Method, Array[AnyRef]) => AnyRef): T =
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef = h(m, a)
      }).asInstanceOf[T]

  private def statement(sql: String): PreparedStatement = {
    val exec = compile(sql)
    val params = mutable.Map.empty[Int, Any]
    val batch = mutable.ArrayBuffer.empty[Seq[Any]]
    def boundRow(): Seq[Any] =
      (1 to (if (params.isEmpty) 0 else params.keys.max)).map(params.getOrElse(_, null))
    proxy(classOf[PreparedStatement]) { (m, a) =>
      m.getName match {
        case "setObject" => params(a(0).asInstanceOf[Int]) = a(1); null
        case "addBatch" => batch += boundRow(); params.clear(); null
        case "executeBatch" =>
          val out = batch.map { p => exec(p); 1 }.toArray
          batch.clear(); out
        case "executeUpdate" => exec(boundRow()); params.clear(); Int.box(1)
        case "close" | "clearParameters" | "clearBatch" => null
        case "isClosed" => java.lang.Boolean.FALSE
        case "toString" => s"FakePreparedStatement($sql)"
        case other => sys.error(s"fake PreparedStatement does not implement $other")
      }
    }
  }

  private def connection(): Connection =
    proxy(classOf[Connection]) { (m, a) =>
      m.getName match {
        case "prepareStatement" => statement(a(0).asInstanceOf[String])
        case "setAutoCommit" | "commit" | "rollback" | "close" => null
        case "getAutoCommit" => java.lang.Boolean.FALSE
        case "isClosed" => java.lang.Boolean.FALSE
        case "isValid" => java.lang.Boolean.TRUE
        case "toString" => "FakeMySqlConnection"
        case other => sys.error(s"fake Connection does not implement $other")
      }
    }

  /** Registered once per JVM; DriverManager routes our URL prefix here. */
  private object TheDriver extends Driver {
    override def connect(url: String, info: Properties): Connection =
      if (acceptsURL(url)) connection() else null
    override def acceptsURL(url: String): Boolean = url.startsWith(UrlPrefix)
    override def getPropertyInfo(u: String, p: Properties) = Array.empty
    override def getMajorVersion: Int = 1
    override def getMinorVersion: Int = 0
    override def jdbcCompliant(): Boolean = false
    override def getParentLogger: Logger = Logger.getGlobal
  }

  def register(): Unit =
    if (!DriverManager.getDrivers.asScala.contains(TheDriver))
      DriverManager.registerDriver(TheDriver)
}
