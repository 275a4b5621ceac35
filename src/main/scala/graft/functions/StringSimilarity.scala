package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity (Winkler 1990, the record-linkage staple) as a
  * codegen'd kernel, e6-rounded for hash-gateable output.
  *
  * Classic parameterization, matching DuckDB's `jaro_winkler_similarity`
  * (the oracle engine) bit-for-bit on the synthetic corpus: match window
  * ⌊max(|a|,|b|)/2⌋−1, transpositions = half the out-of-order matches,
  * prefix bonus l·0.1·(1−jaro) with l ≤ 4 applied ONLY when jaro
  * exceeds the 0.7 boost threshold (verified against DuckDB: below the
  * threshold JW ≡ Jaro). Operates on UTF-16 code units — identical to
  * byte-wise engines for ASCII; non-BMP input would diverge from a
  * codepoint-wise engine, which the corpus never exercises.
  *
  * Complements [[graft.operators.FuzzyJoin]]'s edit-distance tier:
  * Levenshtein counts edits (length-sensitive), Jaro–Winkler rewards
  * shared prefixes — the name/title matching scorer. */
object JaroWinklerKernel {
  def similarityE6(ua: UTF8String, ub: UTF8String): Long = {
    val a = ua.toString; val b = ub.toString
    val la = a.length; val lb = b.length
    // DuckDB scores ANY empty side 0 — including both-empty; match it
    if (la == 0 || lb == 0) return 0L
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L
    // transpositions: matched chars compared in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    var l = 0
    while (l < math.min(4, math.min(la, lb)) && a.charAt(l) == b.charAt(l))
      l += 1
    val jw = if (jaro > 0.7) jaro + l * 0.1 * (1.0 - jaro) else jaro
    math.round(jw * 1000000.0)
  }
}

case class JaroWinklerE6(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "jaro_winkler_e6"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.similarityE6(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerKernel.similarityE6($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerE6 =
    copy(left = newLeft, right = newRight)
}

object StringSimilarity {
  private[graft] val builders: GraftRegistry.Builders = Seq(
    "graft_jaro_winkler_e6" ->
      (exprs => JaroWinklerE6(exprs.head, exprs(1))))

  def register(spark: SparkSession): Unit =
    GraftRegistry.registerTemp(spark, builders)

  /** Requires `register(spark)`. */
  def jaroWinklerE6(a: Column, b: Column): Column =
    call_function("graft_jaro_winkler_e6", a, b)
}
