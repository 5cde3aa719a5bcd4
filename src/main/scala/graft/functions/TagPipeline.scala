package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's tag pipeline
  * (`/root/reference/odgovlt.py:79-94`): `;`→`,`, split on `,`, trim,
  * fixcase, drop empties, collapse non-word runs + lower, keep 2 ≤ len ≤ 100.
  *
  * Why native: the declarative form ([[graft.TextFunctions.packageTagsHof]])
  * is four stacked higher-order array functions, and every `transform` /
  * `filter` lambda is `CodegenFallback` — each layer interprets its lambda
  * per element AND materializes an intermediate array, on the package
  * assembly hot path (three declared queries). This expression runs the
  * whole pipeline in one compiled pass per row with precompiled regexes and
  * participates in whole-stage codegen, like [[SlugTruncate]] and
  * [[JsonProject]].
  *
  * Semantics are pinned element-for-element to the declarative chain by
  * TagPipelineSpec: space-only trim (Spark `trim`), code-point-aware
  * `substring`/`length`, `UTF8String.toLowerCase` for both the fixcase
  * head and the tag body, Unicode `\W` classes.
  */
case class TagPipeline(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tag_pipeline"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tag_pipeline requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(value: Any): Any =
    TagPipelineOps.run(value.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TagPipelineOps.run($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TagPipeline {
  /** DataFrame-API entry: `TagPipeline(col)`. */
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.GraftBridge
    GraftBridge.column(TagPipeline(GraftBridge.expression(c)))
  }

  val info = new ExpressionInfo(classOf[TagPipeline].getName, "tag_pipeline")
  val builder: Seq[Expression] => Expression = ch => TagPipeline(ch.head)
  val identifier: FunctionIdentifier = FunctionIdentifier("tag_pipeline")
}

/** The pipeline body, in a standalone object so generated code reaches it
  * through a plain static forwarder (same pattern as
  * `graft.TextFunctions.truncateSlug` in [[SlugTruncate]]'s codegen).
  */
object TagPipelineOps {

  private val Fixcase = Pattern.compile("^\\p{Lu}\\p{Ll}")
  private val NonWord =
    Pattern.compile("\\W+", Pattern.UNICODE_CHARACTER_CLASS)

  /** Spark's `trim`: strips 0x20 only (not general whitespace). */
  private def trimSpaces(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    if (i == 0 && j == s.length) s else s.substring(i, j)
  }

  def run(input: UTF8String): ArrayData = {
    val parts = input.toString.replace(';', ',').split(",", -1)
    val out = new java.util.ArrayList[AnyRef](parts.length)
    var k = 0
    while (k < parts.length) {
      var t = trimSpaces(parts(k))
      // fixcase: `Xx...` → `xx...`; first "character" = first code point,
      // lowered with UTF8String semantics (what Spark's lower() does)
      if (t.nonEmpty && Fixcase.matcher(t).find()) {
        val n = Character.charCount(t.codePointAt(0))
        t = UTF8String.fromString(t.substring(0, n)).toLowerCase.toString +
          t.substring(n)
      }
      if (t.nonEmpty) {
        // tagify + lower: collapse non-word runs to ' ', trim, lowercase.
        // After the replace, every boundary char is 0x20, so the space-only
        // trim is exhaustive here.
        val cleaned = trimSpaces(NonWord.matcher(t).replaceAll(" "))
        val lowered = UTF8String.fromString(cleaned).toLowerCase
        val nc = lowered.numChars()
        if (nc >= 2 && nc <= 100) out.add(lowered)
      }
      k += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}
