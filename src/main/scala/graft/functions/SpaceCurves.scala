package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Hilbert-curve distance of cell (x, y) — classic xy2d (Hilbert 1891;
  * the reference C loop as published on Wikipedia): per bit-level,
  * quadrant digit (3·rx) XOR ry scaled by s², then rotate/flip the
  * frame. A native `Expression` with codegen, NOT a folded Column tree:
  * the rotation rebinds x and y each level, so a pure-Column unrolling
  * grows ~4^bits expression nodes (8 bits ≈ 65k nodes — codegen OOMs);
  * as generated Java the loop is O(bits) and stays inside
  * WholeStageCodegen. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    SpaceCurves.xy2d(bits, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SpaceCurves.xy2d($bits, $a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

/** Space-filling curve indexes.
  *
  *  - [[zOrderIndex]]: Morton bit interleave — linear-size arithmetic
  *    Column, the cheap curve `sinks/ZOrderTable` clusters by.
  *  - [[hilbertIndex]]: the [[HilbertIndex]] expression above. Hilbert
  *    preserves locality strictly better than Morton — adjacent curve
  *    positions are ALWAYS adjacent cells — so a 2-D range query
  *    touches fewer contiguous index runs (q280 measures exactly that).
  *
  * Both expect coordinates in [0, 2^bits); results fit BIGINT for
  * bits ≤ 31.
  */
object SpaceCurves {

  /** The xy2d loop both the expression's eval and its generated code
    * call (public-domain reference algorithm). */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  private[graft] val builders: GraftRegistry.Builders = Seq(
    "graft_hilbert" -> (exprs => HilbertIndex(exprs(0), exprs(1),
      exprs(2).eval().asInstanceOf[Number].intValue)))

  /** Idempotent per-session registration (same discipline as
    * [[GraftFunctions.register]]). */
  def register(spark: SparkSession): Unit =
    GraftRegistry.registerTemp(spark, builders)

  /** Hilbert distance column; requires [[register]] on the session. */
  def hilbertIndex(x: Column, y: Column, bits: Int): Column =
    call_function("graft_hilbert", x.cast("long"), y.cast("long"),
      lit(bits))

  /** Morton/Z-order: interleave x (even positions) and y (odd). */
  def zOrderIndex(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
      (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** The same unrolled xy2d as DuckDB SQL: emits chained CTEs
    * h1 … h{bits} over `srcCte` (exposing x, y, d=0 and `carry`
    * columns), leaving the final distance in `d`. Kept beside the
    * expression so the Spark side and the oracle can never drift. */
  def hilbertSqlCtes(srcCte: String, bits: Int, carry: Seq[String]): String = {
    val keep = carry.mkString(", ")
    val steps = (0 until bits).map { i =>
      val s = 1L << (bits - 1 - i)
      val prev = if (i == 0) srcCte else s"h$i"
      s"""h${i + 1} AS (SELECT $keep,
         |  d + ${s * s} * (CASE WHEN (x & $s) > 0 THEN
         |      (CASE WHEN (y & $s) > 0 THEN 2 ELSE 3 END)
         |    ELSE (CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END) END) AS d,
         |  CASE WHEN (y & $s) = 0 THEN
         |    (CASE WHEN (x & $s) > 0 THEN ${s - 1} - y ELSE y END)
         |  ELSE x END AS x,
         |  CASE WHEN (y & $s) = 0 THEN
         |    (CASE WHEN (x & $s) > 0 THEN ${s - 1} - x ELSE x END)
         |  ELSE y END AS y
         | FROM $prev)""".stripMargin
    }
    steps.mkString(",\n")
  }
}
