package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, SpecializedGetters, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native JSON serialization of a struct column — a codegen'd replacement
  * for `to_json` on the document-assembly hot path (the reference's per-row
  * JSON round-trip, `/root/reference/odgovlt.py:363,383-406`).
  *
  * Why not `to_json`: Spark's `StructsToJson` is `CodegenFallback`, so when
  * `CollapseProject` inlines the projected aliases, the ENTIRE child tree —
  * slug regexes, tag-pipeline lambdas, date formatting — is pulled out of
  * whole-stage codegen and evaluated interpreted, per row (round-1 bench:
  * 14.1s for the package document vs 3.7s for the same joins flat). This
  * expression implements `doGenCode`, so the children stay compiled; the
  * serializer itself is a schema-specialized writer tree resolved ONCE at
  * plan time (no per-row type dispatch, no Jackson generator allocation).
  *
  * Output is byte-identical to `to_json` with default options (verified by
  * JsonProjectSpec against Jackson over the full document corpus plus
  * adversarial escapes): struct fields with NULL values are omitted
  * (`spark.sql.jsonGenerator.ignoreNullFields=true` semantics), array
  * elements and map values render as `null`, and string escaping follows
  * Jackson (`"`, `\`, `\b \f \n \r \t`, `\u00XX` uppercase hex for other
  * control chars, raw UTF-8 beyond ASCII).
  */
case class JsonProject(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "json_project"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType =>
      JsonWriters.unsupportedIn(st) match {
        case None => TypeCheckResult.TypeCheckSuccess
        case Some(bad) => TypeCheckResult.TypeCheckFailure(
          s"json_project does not support $bad inside ${st.simpleString}")
      }
    case other => TypeCheckResult.TypeCheckFailure(
      s"json_project requires a struct input, got ${other.simpleString}")
  }

  @transient private lazy val writer =
    new JsonStructWriter(child.dataType.asInstanceOf[StructType])

  override def nullSafeEval(value: Any): Any =
    writer.write(value.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonWriter", writer,
      classOf[JsonStructWriter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.write($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonProject {
  /** DataFrame-API entry: `jsonProject(struct(...))`. */
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.GraftBridge
    GraftBridge.column(JsonProject(GraftBridge.expression(c)))
  }

  val info = new ExpressionInfo(classOf[JsonProject].getName, "json_project")
  val builder: Seq[Expression] => Expression = ch => JsonProject(ch.head)
  val identifier: FunctionIdentifier = FunctionIdentifier("json_project")
}

/** Schema-specialized serializer: the writer tree is built once per plan
  * from the struct schema and rebuilt lazily after deserialization on
  * executors (only the schema is shipped).
  */
final class JsonStructWriter(schema: StructType) extends Serializable {
  @transient private lazy val fields = JsonWriters.fieldWriters(schema)

  def write(row: InternalRow): UTF8String = {
    val sb = new java.lang.StringBuilder(64)
    JsonWriters.writeStructBody(sb, row, fields)
    UTF8String.fromString(sb.toString)
  }
}

/** Writer-tree construction + Jackson-compatible escaping. */
object JsonWriters {

  /** Appends the value at ordinal `i` of a row/array accessor. */
  type W = (java.lang.StringBuilder, SpecializedGetters, Int) => Unit

  /** (pre-rendered `"name":` prefix, value writer) per struct field. */
  final case class FieldW(prefix: String, w: W)

  def fieldWriters(st: StructType): Array[FieldW] =
    st.fields.map { f =>
      val sb = new java.lang.StringBuilder
      writeEscaped(sb, f.name)
      sb.append(':')
      FieldW(sb.toString, writerFor(f.dataType))
    }

  /** First unsupported type found in the schema, for analysis-time errors. */
  def unsupportedIn(dt: DataType): Option[String] = dt match {
    case StringType | IntegerType | LongType | ShortType | ByteType |
         DoubleType | FloatType | BooleanType => None
    case ArrayType(et, _) => unsupportedIn(et)
    case st: StructType => st.fields.iterator.flatMap(f => unsupportedIn(f.dataType)).nextOption()
    case MapType(StringType, vt, _) => unsupportedIn(vt)
    case other => Some(other.simpleString)
  }

  def writerFor(dt: DataType): W = dt match {
    case StringType =>
      (sb, g, i) => writeEscaped(sb, g.getUTF8String(i).toString)
    case IntegerType => (sb, g, i) => sb.append(g.getInt(i))
    case LongType => (sb, g, i) => sb.append(g.getLong(i))
    case ShortType => (sb, g, i) => sb.append(g.getShort(i).toInt)
    case ByteType => (sb, g, i) => sb.append(g.getByte(i).toInt)
    case BooleanType => (sb, g, i) => sb.append(g.getBoolean(i))
    case DoubleType => (sb, g, i) => writeDouble(sb, g.getDouble(i))
    case FloatType => (sb, g, i) => writeFloat(sb, g.getFloat(i))
    case ArrayType(et, _) =>
      val ew = writerFor(et)
      (sb, g, i) => {
        val arr = g.getArray(i)
        sb.append('[')
        var j = 0
        val n = arr.numElements()
        while (j < n) {
          if (j > 0) sb.append(',')
          if (arr.isNullAt(j)) sb.append("null") else ew(sb, arr, j)
          j += 1
        }
        sb.append(']')
      }
    case st: StructType =>
      val fw = fieldWriters(st)
      val n = st.length
      (sb, g, i) => writeStructBody(sb, g.getStruct(i, n), fw)
    case MapType(StringType, vt, _) =>
      val vw = writerFor(vt)
      (sb, g, i) => {
        val m = g.getMap(i)
        val keys = m.keyArray()
        val vals = m.valueArray()
        sb.append('{')
        var j = 0
        val n = m.numElements()
        while (j < n) {
          if (j > 0) sb.append(',')
          writeEscaped(sb, keys.getUTF8String(j).toString)
          sb.append(':')
          if (vals.isNullAt(j)) sb.append("null") else vw(sb, vals, j)
          j += 1
        }
        sb.append('}')
      }
    case other =>
      throw new UnsupportedOperationException(
        s"json_project: unsupported type ${other.simpleString}")
  }

  def writeStructBody(sb: java.lang.StringBuilder, row: SpecializedGetters,
      fields: Array[FieldW]): Unit = {
    sb.append('{')
    var first = true
    var i = 0
    while (i < fields.length) {
      // NULL struct fields are omitted — to_json's default
      // (spark.sql.jsonGenerator.ignoreNullFields=true)
      if (!row.isNullAt(i)) {
        if (!first) sb.append(',')
        first = false
        sb.append(fields(i).prefix)
        fields(i).w(sb, row, i)
      }
      i += 1
    }
    sb.append('}')
  }

  /** Jackson writes non-finite doubles as quoted strings
    * (QUOTE_NON_NUMERIC_NUMBERS default). */
  private def writeDouble(sb: java.lang.StringBuilder, d: Double): Unit =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) {
      sb.append('"'); sb.append(d); sb.append('"')
    } else sb.append(d)

  private def writeFloat(sb: java.lang.StringBuilder, f: Float): Unit =
    if (java.lang.Float.isNaN(f) || java.lang.Float.isInfinite(f)) {
      sb.append('"'); sb.append(f); sb.append('"')
    } else sb.append(f)

  private val Hex = "0123456789ABCDEF".toCharArray

  /** Jackson-default string escaping: `"` `\` get backslashes, the five
    * short control escapes, `\u00XX` (uppercase hex) for other chars < 0x20,
    * everything else (including all non-ASCII) written raw.
    */
  def writeEscaped(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '"') sb.append("\\\"")
      else if (c == '\\') sb.append("\\\\")
      else if (c >= 0x20) sb.append(c)
      else c match {
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ =>
          sb.append("\\u00")
          sb.append(Hex((c >> 4) & 0xF))
          sb.append(Hex(c & 0xF))
      }
      i += 1
    }
    sb.append('"')
  }
}
