package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expression: XXH64 of a string's UTF-8 bytes with an explicit seed.
  *
  * Native `Expression` with codegen (not a Scala UDF) so it stays inside
  * WholeStageCodegen — this sits on the hot path of query-feature hashing
  * (reference: P:common/util/StringUtil.java:6-51, seed 0).
  */
case class XxHash64Utf8(child: Expression, seed: Long)
    extends UnaryExpression {

  // Callers cast the child to string (see GraftFunctions.xxhash64Seed0).
  override def dataType: DataType = LongType
  override def prettyName: String = "xxhash64_seed"

  override protected def nullSafeEval(input: Any): Any =
    XxHash64.hashBytes(input.asInstanceOf[UTF8String].getBytes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.XxHash64.hashBytes($c.getBytes(), ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): XxHash64Utf8 =
    copy(child = newChild)
}

/** Registration + Column helpers for graft's custom expressions. */
object GraftFunctions {
  private[graft] val builders: GraftRegistry.Builders = Seq(
    "graft_xxhash64_0" -> (exprs => XxHash64Utf8(exprs.head, 0L)))

  /** Idempotent per-session registration of graft SQL functions. */
  def register(spark: SparkSession): Unit =
    GraftRegistry.registerTemp(spark, builders)

  /** xxhash64 with seed 0 (byte-compatible with cespare Sum64String).
    * Requires `register(spark)` first (queries call it on entry). */
  def xxhash64Seed0(c: Column): Column =
    call_function("graft_xxhash64_0", c.cast("string"))
}
