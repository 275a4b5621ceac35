package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles in one kernel.
  *
  * The declarative form (regexp split → transform(sequence) with
  * slice+concat_ws → array_distinct) allocates per gram and pays an O(n²)
  * string-compare distinct per document — it dominated the near-dup
  * pipeline's scan stage. This expression tokenizes on whitespace, builds
  * each n-gram once, and dedupes through a hash set in a single pass.
  * Output order = first occurrence (array_distinct's order), so plans
  * composed on top see identical arrays.
  */
object WordShinglesKernel {
  // exactly Spark's split(trim(text), "\\s+") pipeline: UTF8String.trim
  // removes spaces only, Pattern.split with limit -1 keeps edge empties
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = Ws.split(text.trim().toString, -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](m * 2)
    var g = 0
    val sb = new java.lang.StringBuilder(64)
    while (g < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(g + j))
        j += 1
      }
      seen.add(sb.toString)
      g += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesKernel.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShinglesKernel.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_word_shingles",
      exprs => WordShingles(exprs.head,
        exprs.lift(1).map(_.eval(null).toString.toInt).getOrElse(3)),
      "built-in")

  /** Requires `register(spark)`. */
  def wordShingles(c: Column, n: Int): Column =
    call_function("graft_word_shingles", c.cast("string"),
      org.apache.spark.sql.functions.lit(n))
}
