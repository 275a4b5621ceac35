package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** Tight-loop kernels for the quantized vector scoring
  * (VectorFunctions.dotE9 semantics): Σ round(a_i·b_i·1e9) as BIGINT.
  *
  * The zip_with/aggregate formulation evaluates interpreted lambdas and
  * allocates an intermediate array per row pair — fine for small plans,
  * dominant at |pairs|·dims scale. This expression runs one allocation-free
  * loop inside whole-stage codegen. Rounding is half-away-from-zero to
  * match SQL ROUND in Spark and DuckDB.
  */
object VectorOps {
  @inline private def roundAway(v: Double): Long =
    if (v < 0) -Math.round(-v) else Math.round(v)

  def dotE9(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += roundAway(a.getFloat(i).toDouble * b.getFloat(i).toDouble * 1e9)
      i += 1
    }
    acc
  }

  def normSqE9(a: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      acc += roundAway(x * x * 1e9)
      i += 1
    }
    acc
  }
}

/** Quantized dot product of two float-array columns. */
case class QuantizedDotE9(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_e9"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotE9(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dotE9($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorExpressions {
  private[graft] val builders: GraftRegistry.Builders = Seq(
    "graft_dot_e9" -> (exprs => QuantizedDotE9(exprs(0), exprs(1))))

  def register(spark: SparkSession): Unit =
    GraftRegistry.registerTemp(spark, builders)

  /** Requires `register(spark)` — operators register on entry. */
  def dotE9Fast(a: Column, b: Column): Column = call_function("graft_dot_e9", a, b)

  def normSqE9Fast(a: Column): Column = call_function("graft_dot_e9", a, a)
}
