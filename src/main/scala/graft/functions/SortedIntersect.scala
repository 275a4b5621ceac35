package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** |A ∩ B| for two ascending-sorted long arrays via a two-pointer merge.
  *
  * The near-dup verification stage computes one intersection per candidate
  * pair; `array_intersect` builds a hash set of boxed elements per call.
  * This kernel is a primitive-long merge — O(na+nb), zero allocation — and
  * relies on WordShingleHashes emitting sorted arrays, so no re-sort.
  */
object SortedLongIntersectKernel {
  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }
}

case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_long_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedLongIntersectKernel.intersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedLongIntersectKernel.intersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersect {
  private[graft] val builders: GraftRegistry.Builders = Seq(
    "graft_sorted_intersect_count" ->
      (exprs => SortedLongIntersectCount(exprs.head, exprs(1))))

  def register(spark: SparkSession): Unit =
    GraftRegistry.registerTemp(spark, builders)

  /** Requires `register(spark)`; both arrays must be ascending-sorted. */
  def intersectCount(a: Column, b: Column): Column =
    call_function("graft_sorted_intersect_count", a, b)
}
