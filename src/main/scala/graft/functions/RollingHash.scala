package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp–Rabin rolling-hash document fingerprinting (public algorithm;
  * winnowing selection per Schleimer, Wilkerson, Aiken, "Winnowing: Local
  * Algorithms for Document Fingerprinting", SIGMOD'03).
  *
  * `minWindowHash` slides a `window`-byte Karp–Rabin hash across the UTF-8
  * bytes and returns the minimum — a robust scalar fingerprint that is
  * stable under small insertions outside the minimizing window and cheap
  * enough to run inside whole-stage codegen over a 100 TB text scan.
  */
object RollingHash {
  // Karp–Rabin base/modulus: base 257, modulus 2^61-1 (a Mersenne prime —
  // fast reduction, negligible collision rate on 61-bit hashes).
  private final val Mod = (1L << 61) - 1
  private final val Base = 257L

  @inline private def mulMod(a: Long, b: Long): Long = {
    // 128-bit multiply mod 2^61-1 via Math.multiplyHigh (JDK9+)
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // (hi:lo) mod (2^61-1): fold the top 67 bits down
    val r = (lo & Mod) + ((lo >>> 61) | (hi << 3))
    val r2 = (r & Mod) + (r >>> 61)
    if (r2 >= Mod) r2 - Mod else r2
  }

  /** Minimum Karp–Rabin hash over all `window`-byte substrings; hashes the
    * whole input when shorter than `window`. */
  def minWindowHash(bytes: Array[Byte], window: Int): Long = {
    val n = bytes.length
    val w = math.min(math.max(window, 1), math.max(n, 1))
    if (n == 0) return 0L
    // precompute Base^(w-1) mod Mod
    var pow = 1L
    var i = 1
    while (i < w) { pow = mulMod(pow, Base); i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = (mulMod(h, Base) + (bytes(i) & 0xffL)) % Mod; i += 1 }
    var min = h
    while (i < n) {
      val out = (bytes(i - w) & 0xffL)
      h = (h + Mod - mulMod(out, pow) % Mod) % Mod
      h = (mulMod(h, Base) + (bytes(i) & 0xffL)) % Mod
      if (h < min) min = h
      i += 1
    }
    min
  }

  def minWindowHashUtf8(s: UTF8String, window: Int): Long =
    minWindowHash(s.getBytes, window)

  /** SplitMix64 finisher (Steele, Lea, Flood, "Fast Splittable Pseudorandom
    * Number Generators", OOPSLA'14 — public constants): full-avalanche
    * mixing of a 64-bit value with only adds/xors/shifts/multiplies, so an
    * ANSI-SQL oracle can replicate it bit-exactly in 128-bit integer
    * arithmetic (multiplies split into 32-bit halves mod 2^64). */
  @inline def splitMix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 64-bit string hash = splitMix64(Karp–Rabin poly hash of the UTF-8
    * bytes, mod 2^61-1). Unlike xxhash64 (stripe/rotate lanes), every step
    * here is SQL-expressible, so token-hash-derived operators (SimHash)
    * can be gated against a DuckDB oracle instead of unit tests only. */
  def polyHash64(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (mulMod(h, Base) + (bytes(i) & 0xffL)) % Mod; i += 1 }
    splitMix64(h)
  }

  def polyHash64Utf8(s: UTF8String): Long = polyHash64(s.getBytes)
}

/** Codegen-friendly scalar wrapper for [[RollingHash.polyHash64Utf8]]. */
case class PolyHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash64"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.polyHash64Utf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.polyHash64Utf8($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
}

/** Codegen-friendly scalar wrapper for [[RollingHash.splitMix64]] — the
  * engine-standard 64-bit finisher exposed directly for LONG inputs
  * (deterministic per-row draws: bootstrap weights, salt derivation),
  * replayable in unsigned SQL via the q62 mod-2^64 multiply chain. */
case class SplitMix64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "splitmix64"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.splitMix64(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.splitMix64($c)")

  override protected def withNewChildInternal(newChild: Expression): SplitMix64Expr =
    copy(child = newChild)
}

object PolyHash64 {
  private[graft] val builders: GraftRegistry.Builders = Seq(
    "graft_poly_hash64" -> (exprs => PolyHash64(exprs.head)),
    "graft_splitmix64" -> (exprs => SplitMix64Expr(exprs.head)))

  def register(spark: SparkSession): Unit =
    GraftRegistry.registerTemp(spark, builders)

  /** Column helper; requires `register(spark)`. */
  def polyHash64(c: Column): Column =
    call_function("graft_poly_hash64", c.cast("string"))
}

/** Catalyst expression wrapper with codegen (stays in WholeStageCodegen). */
case class RollingMinHash(child: Expression, window: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_min_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.minWindowHashUtf8(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHash.minWindowHashUtf8($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {
  private[graft] val builders: GraftRegistry.Builders = Seq(
    "graft_rolling_min_hash" -> (exprs => RollingMinHash(exprs.head,
      exprs.lift(1).map(_.eval(null).toString.toInt).getOrElse(32))))

  def register(spark: SparkSession): Unit =
    GraftRegistry.registerTemp(spark, builders)

  /** Column helper; requires `register(spark)`. */
  def rollingMinHash(c: Column, window: Int): Column =
    call_function("graft_rolling_min_hash", c.cast("string"),
      org.apache.spark.sql.functions.lit(window))
}
