package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit, typedlit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Product-quantization kernels (operators/Similarity.pqTopK).
  *
  * A DataFrame-API formulation needs subspaces × codebookSize dot
  * expressions for encoding and the same again for the query LUTs —
  * a ~256-node tree whose generated method stalls the JIT (the same
  * failure mode the plane-sign LSH avoided; measured ~3s of q52's cold
  * time). Each kernel here is ONE expression running an allocation-free
  * loop, with arithmetic identical to `VectorOps.dotE9` (per-term
  * half-away-from-zero e9 rounding) so results — and the DuckDB oracle —
  * are bit-unchanged. */
object PqKernel {
  @inline private def roundAway(v: Double): Long =
    if (v < 0) -Math.round(-v) else Math.round(v)

  /** Per-subspace argmin codes against the codebook; `d = cnsq - 2·dot`
    * (the own-norm term is constant per subvector), lowest code on ties. */
  def encode(v: ArrayData, cb: Array[Array[Array[Float]]], subDim: Int): ArrayData = {
    val out = new Array[Int](cb.length)
    val n = v.numElements()
    var m = 0
    while (m < cb.length) {
      val cents = cb(m); val off = m * subDim
      var best = Long.MaxValue; var bestC = 0
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var dot = 0L; var cn = 0L
        var i = 0
        // full-width centroid norm, truncation guards only the dot —
        // missing vector components read as zeros, the SAME metric the
        // ADC lut kernel scores with (a truncated norm here would code
        // short vectors under a different distance than they're scored)
        while (i < subDim) {
          val ci = cent(i).toDouble
          cn += roundAway(ci * ci * 1e9)
          if (off + i < n)
            dot += roundAway(v.getFloat(off + i).toDouble * ci * 1e9)
          i += 1
        }
        val d = cn - 2L * dot
        if (d < best) { best = d; bestC = c }
        c += 1
      }
      out(m) = bestC
      m += 1
    }
    new GenericArrayData(out)
  }

  /** Flattened ADC lookup table: lut[m·codebookSize + c] =
    * 2·dot(q_m, cent) − ‖cent‖² in e9 quantization — the classic
    * L2 ADC table: summing entries gives −‖q − recon(c)‖² up to the
    * constant ‖q‖² term, so ranking DESC ranks by approximate L2
    * (a raw-dot table would rank by inner product, which diverges from
    * the L2/cosine neighbors the quantizer was trained for). */
  def lut(v: ArrayData, cb: Array[Array[Array[Float]]], subDim: Int): ArrayData = {
    val k = if (cb.isEmpty) 0 else cb(0).length
    val out = new Array[Long](cb.length * k)
    val n = v.numElements()
    var m = 0
    while (m < cb.length) {
      val cents = cb(m); val off = m * subDim
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var dot = 0L; var cn = 0L
        var i = 0
        while (i < subDim) {
          val ci = cent(i).toDouble
          cn += roundAway(ci * ci * 1e9)
          if (off + i < n)
            dot += roundAway(v.getFloat(off + i).toDouble * ci * 1e9)
          i += 1
        }
        out(m * k + c) = 2L * dot - cn
        c += 1
      }
      m += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score: Σ_m lut[m·codebookSize + codes[m]]. */
  def adc(codes: ArrayData, lutArr: ArrayData, codebookSize: Int): Long = {
    var acc = 0L
    var m = 0
    while (m < codes.numElements()) {
      acc += lutArr.getLong(m * codebookSize + codes.getInt(m))
      m += 1
    }
    acc
  }
}

abstract class PqCodebookExpression extends UnaryExpression {
  def codebook: Array[Array[Array[Float]]]
  def subDim: Int
  protected def genCall(ctx: CodegenContext, ev: ExprCode,
      method: String): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "float[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqKernel.$method($c, $cbRef, $subDim)")
  }
}

case class PqEncode(child: Expression, codebook: Array[Array[Array[Float]]],
    subDim: Int) extends PqCodebookExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override protected def nullSafeEval(input: Any): Any =
    PqKernel.encode(input.asInstanceOf[ArrayData], codebook, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genCall(ctx, ev, "encode")
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

case class PqLut(child: Expression, codebook: Array[Array[Array[Float]]],
    subDim: Int) extends PqCodebookExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_lut"
  override protected def nullSafeEval(input: Any): Any =
    PqKernel.lut(input.asInstanceOf[ArrayData], codebook, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genCall(ctx, ev, "lut")
  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

object PqExpressions {
  /** The codebook rides the function call as a nested array literal and is
    * decoded once at expression-build time (the registry API only passes
    * expressions, and a reference object beats re-evaluating a 3-deep
    * literal per row). */
  private def decodeCodebook(e: Expression): Array[Array[Array[Float]]] = {
    val top = e.eval(null).asInstanceOf[ArrayData]
    top.toObjectArray(ArrayType(ArrayType(org.apache.spark.sql.types.FloatType)))
      .map { mArr =>
        mArr.asInstanceOf[ArrayData]
          .toObjectArray(ArrayType(org.apache.spark.sql.types.FloatType))
          .map(_.asInstanceOf[ArrayData].toFloatArray())
      }
  }

  private[graft] val builders: GraftRegistry.Builders = Seq(
    "graft_pq_encode" -> (exprs => PqEncode(exprs.head,
      decodeCodebook(exprs(1)), exprs(2).eval(null).toString.toInt)),
    "graft_pq_lut" -> (exprs => PqLut(exprs.head,
      decodeCodebook(exprs(1)), exprs(2).eval(null).toString.toInt)),
    "graft_pq_adc" -> (exprs => PqAdc(exprs(0), exprs(1),
      exprs(2).eval(null).toString.toInt)))

  def register(spark: SparkSession): Unit =
    GraftRegistry.registerTemp(spark, builders)

  private def cbLit(cb: Array[Array[Array[Float]]]): Column =
    typedlit[Seq[Seq[Seq[Float]]]](cb.map(_.map(_.toSeq).toSeq).toSeq)

  def pqEncode(v: Column, cb: Array[Array[Array[Float]]], subDim: Int): Column =
    call_function("graft_pq_encode", v, cbLit(cb), lit(subDim))
  def pqLut(v: Column, cb: Array[Array[Array[Float]]], subDim: Int): Column =
    call_function("graft_pq_lut", v, cbLit(cb), lit(subDim))
  def pqAdc(codes: Column, lut: Column, codebookSize: Int): Column =
    call_function("graft_pq_adc", codes, lut, lit(codebookSize))
}

case class PqAdc(left: Expression, right: Expression, codebookSize: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqKernel.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], codebookSize)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.PqKernel.adc($a, $b, $codebookSize)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
