package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's slug length cap
  * (`/root/reference/odgovlt.py:50-69`, golden-pinned by
  * tests/test_odgovlt.py:391-399) — the one scalar in the surface that
  * built-in functions cannot express (SURVEY.md §7.4).
  *
  * A native `BinaryExpression` with `doGenCode` instead of a Scala UDF:
  * no Row boxing, no closure serialization, participates in whole-stage
  * codegen and constant-folding; the generated code calls the shared
  * algorithm directly on the already-normalized slug.
  */
case class SlugTruncate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "slug_truncate"

  override def nullSafeEval(slug: Any, len: Any): Any =
    UTF8String.fromString(graft.TextFunctions.truncateSlug(
      slug.asInstanceOf[UTF8String].toString, len.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, l) =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.TextFunctions.truncateSlug($s.toString(), $l))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SlugTruncate {
  val info = new ExpressionInfo(classOf[SlugTruncate].getName, "slug_truncate")
  val builder: Seq[Expression] => Expression = ch => SlugTruncate(ch(0), ch(1))
  val identifier: FunctionIdentifier = FunctionIdentifier("slug_truncate")
}

/** Session extension registering the native SQL functions:
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((SlugTruncate.identifier, SlugTruncate.info, SlugTruncate.builder))
    ext.injectFunction((JsonProject.identifier, JsonProject.info, JsonProject.builder))
    ext.injectFunction((TagPipeline.identifier, TagPipeline.info, TagPipeline.builder))
    ext.injectFunction((CharTrigrams.identifier, CharTrigrams.info, CharTrigrams.builder))
    ext.injectFunction((DotProduct.identifier, DotProduct.info, DotProduct.builder))
    ext.injectFunction((WordShingles.identifier, WordShingles.info, WordShingles.builder))
    ext.injectFunction((QuantizeInt8.identifier, QuantizeInt8.info, QuantizeInt8.builder))
    ext.injectFunction((Unidecode.identifier, Unidecode.info, Unidecode.builder))
  }
}
