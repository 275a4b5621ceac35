package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.{call_function, lit, typedlit}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** fastText-shaped linear quality classifier over hashed bag-of-ngrams
  * (Joulin et al. 2017, "Bag of Tricks for Efficient Text Classification" —
  * the hashing trick per Weinberger et al. 2009). The standard LLM-corpus
  * quality filter (CCNet-style) is exactly this shape: tokenize, hash each
  * unigram/bigram into a fixed bucket space, sum the buckets' learned
  * weights, threshold the score.
  *
  * Everything runs in ONE allocation-free pass over the UTF-8 bytes inside
  * whole-stage codegen — tokenization, per-token Karp–Rabin hashing
  * (identical arithmetic to [[RollingHash.polyHash64]]: base 257 mod
  * 2^61−1, splitMix64 finisher), bigram hashes by mod-homomorphism
  * (h(a∥' '∥b) folds from h(a) and h(b) without re-scanning), bucket =
  * finished hash & (2^maskBits − 1), and the weight lookup. Zero shuffle:
  * the ideal 100 TB shape — a scalar projection the scan pipeline absorbs.
  *
  * Two weight sources:
  *  - procedural: w(b) = ((splitMix64(b ⊕ seed) >>> 13) mod 2001) − 1000 —
  *    a deterministic stand-in for a trained model that a SQL oracle can
  *    replay bit-exactly (the q59 gate path; no model files exist here);
  *  - a real trained table: `Array[Int]` of size 2^maskBits, shipped into
  *    codegen via `addReferenceObj` exactly like the PQ codebooks — plug in
  *    fastText/logistic weights without touching the kernel.
  */
object HashedClassifierOps {
  private final val Mod = (1L << 61) - 1
  private final val Base = 257L

  @inline private def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val r = (lo & Mod) + ((lo >>> 61) | (hi << 3))
    val r2 = (r & Mod) + (r >>> 61)
    if (r2 >= Mod) r2 - Mod else r2
  }

  @inline def proceduralWeight(bucket: Long, seed: Long): Long =
    ((RollingHash.splitMix64(bucket ^ seed) >>> 13) % 2001L) - 1000L

  /** Σ w(bucket(ngram)) over whitespace unigrams (+ bigrams when
    * `bigrams`); `weights` == null selects the procedural table. */
  def score(s: UTF8String, maskBits: Int, seed: Long, bigrams: Boolean,
      weights: Array[Int]): Long = {
    val bytes = s.getBytes
    val mask = (1L << maskBits) - 1
    @inline def w(kr: Long): Long = {
      val b = RollingHash.splitMix64(kr) & mask
      if (weights == null) proceduralWeight(b, seed) else weights(b.toInt).toLong
    }
    var acc = 0L
    var prevKr = -1L // Karp–Rabin of the previous token; -1 = none yet
    var i = 0
    val n = bytes.length
    // whitespace = RE2's \s set [\t\n\f\r ] — matching the oracle's
    // regexp_split semantics exactly (Java's \s adds \x0B; don't use it)
    @inline def ws(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == '\f' || b == '\r'
    while (i < n) {
      // skip whitespace
      while (i < n && ws(bytes(i))) i += 1
      if (i < n) {
        var kr = 0L // token hash
        var pw = 1L // 257^len(token) — folds the bigram without re-scanning
        while (i < n && !ws(bytes(i))) {
          kr = (mulMod(kr, Base) + (bytes(i) & 0xffL)) % Mod
          pw = mulMod(pw, Base)
          i += 1
        }
        acc += w(kr)
        if (bigrams && prevKr >= 0) {
          // h(prev ∥ ' ' ∥ cur) = ((h(prev)·257 + 32)·257^len(cur) + h(cur)) mod p
          val withSep = (mulMod(prevKr, Base) + 32L) % Mod
          acc += w((mulMod(withSep, pw) + kr) % Mod)
        }
        prevKr = kr
      }
    }
    acc
  }
}

/** Codegen scalar: procedural-weight variant (the oracle-replayable path). */
case class HashedNgramScore(child: Expression, maskBits: Int, seed: Long,
    bigrams: Boolean) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_ngram_score"

  override protected def nullSafeEval(input: Any): Any =
    HashedClassifierOps.score(input.asInstanceOf[UTF8String], maskBits, seed,
      bigrams, null)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashedClassifierOps.score($c, $maskBits, ${seed}L, $bigrams, null)")

  override protected def withNewChildInternal(newChild: Expression): HashedNgramScore =
    copy(child = newChild)
}

/** Codegen scalar: trained-weight variant — the 2^maskBits table rides into
  * generated code as one reference object (never an expression tree). */
case class HashedNgramScoreTable(child: Expression, maskBits: Int,
    weights: Array[Int], bigrams: Boolean) extends UnaryExpression {
  require(weights.length == (1 << maskBits),
    s"weight table ${weights.length} != 2^$maskBits")
  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_ngram_score_table"

  override protected def nullSafeEval(input: Any): Any =
    HashedClassifierOps.score(input.asInstanceOf[UTF8String], maskBits, 0L,
      bigrams, weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hcWeights", weights, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashedClassifierOps.score($c, $maskBits, 0L, $bigrams, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedNgramScoreTable =
    copy(child = newChild)
}

object HashedClassifier {
  private[graft] val builders: GraftRegistry.Builders = Seq(
    "graft_hashed_ngram_score" -> (exprs => HashedNgramScore(exprs.head,
      exprs(1).eval(null).toString.toInt,
      exprs(2).eval(null).toString.toLong,
      exprs(3).eval(null).toString.toBoolean)),
    // the weight literal decodes ONCE at expression-build time into the
    // reference object (same pattern as the PQ codebook literals)
    "graft_hashed_ngram_score_table" -> (exprs => HashedNgramScoreTable(
      exprs.head,
      exprs(1).eval(null).toString.toInt,
      exprs(2).eval(null).asInstanceOf[
        org.apache.spark.sql.catalyst.util.ArrayData].toIntArray(),
      exprs(3).eval(null).toString.toBoolean)))

  def register(spark: SparkSession): Unit =
    GraftRegistry.registerTemp(spark, builders)

  /** Column helper (procedural weights); requires `register(spark)`. */
  def hashedNgramScore(c: Column, maskBits: Int, seed: Long,
      bigrams: Boolean): Column =
    call_function("graft_hashed_ngram_score", c.cast("string"),
      lit(maskBits), lit(seed), lit(bigrams))

  /** Column helper (trained weight table); requires `register(spark)`. */
  def hashedNgramScoreTable(c: Column, maskBits: Int, weights: Array[Int],
      bigrams: Boolean): Column =
    call_function("graft_hashed_ngram_score_table", c.cast("string"),
      lit(maskBits), typedlit[Seq[Int]](weights.toSeq), lit(bigrams))
}
