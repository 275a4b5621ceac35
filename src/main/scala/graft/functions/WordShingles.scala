package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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
  private[functions] val Ws = java.util.regex.Pattern.compile("\\s+")

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

/** Distinct word n-gram shingles, xxhash64(seed 0)-hashed to int64 and
  * sorted ascending, in one kernel.
  *
  * The near-dup pipeline never needs the shingle *strings* — only equality
  * (candidate generation) and set intersection (verification). Hashing at
  * the kernel shrinks every downstream exchange ~8× (a 20-byte UTF-8 gram
  * → 8-byte long) and the sorted output feeds a sorted-merge intersect
  * without re-sorting. Collision risk is |per-doc shingles|²/2⁶⁴ per doc —
  * negligible at any realistic document size.
  */
object WordShingleHashesKernel {
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val toks = WordShinglesKernel.Ws.split(text.trim().toString, -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val out = new Array[Long](m)
    var k = 0
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
      val h = XxHash64.hashString(sb.toString, 0L)
      if (seen.add(h)) { out(k) = h; k += 1 }
      g += 1
    }
    val trimmed = java.util.Arrays.copyOf(out, k)
    java.util.Arrays.sort(trimmed)
    new GenericArrayData(trimmed)
  }
}

case class WordShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WordShingleHashesKernel.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShingleHashesKernel.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
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
  private[graft] val builders: GraftRegistry.Builders = Seq(
    "graft_word_shingles" -> (exprs => WordShingles(exprs.head,
      exprs.lift(1).map(_.eval(null).toString.toInt).getOrElse(3))),
    "graft_word_shingle_hashes" -> (exprs => WordShingleHashes(exprs.head,
      exprs.lift(1).map(_.eval(null).toString.toInt).getOrElse(3))))

  def register(spark: SparkSession): Unit =
    GraftRegistry.registerTemp(spark, builders)

  /** Requires `register(spark)`. */
  def wordShingles(c: Column, n: Int): Column =
    call_function("graft_word_shingles", c.cast("string"),
      org.apache.spark.sql.functions.lit(n))

  /** Sorted distinct int64 shingle hashes. Requires `register(spark)`. */
  def wordShingleHashes(c: Column, n: Int): Column =
    call_function("graft_word_shingle_hashes", c.cast("string"),
      org.apache.spark.sql.functions.lit(n))
}
