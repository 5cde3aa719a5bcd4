package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType

/** INT-literal extractor shared by the sketch-aggregate SQL builders
  * ([[KMinValues]], [[HllRegisters]], [[CmsSketch]]): sketch geometry
  * must be a plan-time constant — a column-valued size would make the
  * aggregation buffer shape data-dependent.
  */
private[functions] object IntLit {
  def unapply(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) => Some(v)
    case _ => None
  }
}
