package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch: keeps the `k` smallest
  * DISTINCT hash values seen, from which `|D| ≈ (k-1) · M / h_(k)` estimates
  * the distinct count over a hash space of size `M` (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM 2002).
  *
  * This is the scale answer to COUNT(DISTINCT x) per group: a bounded
  * O(k) mergeable state, so partial aggregation ships at most `k` longs
  * per (partition, group) through the shuffle — versus the exact form
  * shuffling every distinct value. Unlike HLL (whose register layout is
  * engine-private — Spark's `approx_count_distinct` and DuckDB's disagree),
  * the KMV state over an md5-derived hash is ENGINE-PORTABLE: the oracle
  * reproduces the sketch exactly with `list_sort(list(DISTINCT h))[1:k]`,
  * so the differential harness can pin not just the estimate but the whole
  * sketch, value for value.
  *
  * The aggregate consumes ALREADY-HASHED longs (hash outside, in codegen —
  * [[graft.llm.TextHash.md5Long]]); it sorts, dedupes, and caps. Input
  * NULLs are skipped (count(DISTINCT) semantics; DuckDB's list() keeps
  * NULLs, so the declared query hashes a NOT NULL key to keep the engines
  * trivially aligned). Output is the ascending array of at most `k` hashes
  * (fewer iff the group has fewer distinct hashes — then the sketch IS the
  * exact distinct set).
  */
case class KMinValues(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  override def prettyName: String = "kmin_values"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 2) TypeCheckResult.TypeCheckFailure(
      s"kmin_values requires k >= 2, got $k")
    else child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kmin_values requires a bigint input (pre-hashed), got ${other.simpleString}")
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) {
      // add() returning false = v already present; the cap is unchanged
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinValues =
    copy(child = newChild)
}

object KMinValues {
  /** Column form: `kminValues(hashCol, k)` → ascending array of ≤ k hashes. */
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(
      new KMinValues(GraftBridge.expression(c), k).toAggregateExpression())

  // SQL registration (GraftCatalog): the analyzer wraps a bare
  // AggregateFunction returned by a registry builder in an
  // AggregateExpression itself, same as the built-in aggregates
  val info = new ExpressionInfo(classOf[KMinValues].getName, "kmin_values")
  val builder: Seq[Expression] => Expression = {
    case Seq(child, IntLit(k)) => new KMinValues(child, k)
    case other if other.size != 2 => throw new IllegalArgumentException(
      s"kmin_values(hash BIGINT, k INT literal) expects 2 arguments, got ${other.size}")
    case other => throw new IllegalArgumentException(
      s"kmin_values: k must be an INT literal, got ${other(1).sql}")
  }
  val identifier: FunctionIdentifier = FunctionIdentifier("kmin_values")

}
