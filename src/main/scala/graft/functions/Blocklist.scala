package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring matching via Aho–Corasick (Aho & Corasick 1975)
  * — the blocklist primitive behind C4's banned-word filter and
  * RefinedWeb's URL/word blocklists: thousands of patterns matched against
  * every document in ONE pass over the bytes, instead of one regex or
  * `contains` scan per pattern.
  *
  * The automaton (goto trie + BFS failure links + dictionary suffix
  * links) is built once per expression instance from the pattern list and
  * rides into generated code as a reference object, exactly like the PQ
  * codebooks and classifier weight tables — the hot path is one
  * allocation-free byte walk inside whole-stage codegen, O(|text| +
  * matches) regardless of pattern count.
  *
  * Matching semantics (pinned for the oracle): raw SUBSTRING matches on
  * the exact bytes — every occurrence counts, including overlapping ones
  * and patterns nested inside longer matches ("an" inside "scan" — the
  * dictionary-suffix-link chain is what surfaces these). Case-fold at the
  * call site (`lower(text)`) when case-insensitivity is wanted. */
/** Immutable byte-level Aho–Corasick automaton. Nodes are dense 256-way
  * tables (a blocklist's total pattern bytes are small — thousands of
  * nodes — so dense goto keeps the walk branch-free). Top-level class so
  * the codegen reference-object type is a plain Java name. */
final class AhoCorasick(patterns: Seq[String]) extends Serializable {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty))
    private val pats: Array[Array[Byte]] =
      patterns.map(_.getBytes("UTF-8")).toArray

    // --- trie build ---
    private val maxNodes = pats.map(_.length).sum + 1
    private val next = Array.fill(maxNodes * 256)(-1)
    private val endPat = Array.fill(maxNodes)(-1)   // pattern id ending here
    private var nNodes = 1
    for (pid <- pats.indices) {
      var s = 0
      for (b <- pats(pid)) {
        val c = b & 0xff
        if (next(s * 256 + c) < 0) { next(s * 256 + c) = nNodes; nNodes += 1 }
        s = next(s * 256 + c)
      }
      endPat(s) = pid
    }
    // --- BFS failure + dictionary links; cnt[s] = patterns ending at s
    // or on its failure chain (so the walk adds one array lookup per
    // byte, no chain chasing for counting) ---
    private val fail = new Array[Int](nNodes)
    private val dict = Array.fill(nNodes)(-1) // nearest suffix node with a pattern
    private val cnt = new Array[Int](nNodes)
    locally {
      val queue = new java.util.ArrayDeque[Integer]()
      for (c <- 0 until 256) {
        val v = next(c)
        if (v < 0) next(c) = 0
        else { fail(v) = 0; queue.add(v) }
      }
      while (!queue.isEmpty) {
        val u = queue.poll()
        cnt(u) = (if (endPat(u) >= 0) 1 else 0) + cnt(fail(u))
        dict(u) = if (endPat(fail(u)) >= 0) fail(u) else dict(fail(u))
        for (c <- 0 until 256) {
          val v = next(u * 256 + c)
          if (v < 0) next(u * 256 + c) = next(fail(u) * 256 + c)
          else { fail(v) = next(fail(u) * 256 + c); queue.add(v) }
        }
      }
    }

    def nPatterns: Int = pats.length

    /** Total occurrences of all patterns (overlaps included). */
    def countAll(s: UTF8String): Long = {
      val bytes = s.getBytes
      var st = 0; var total = 0L; var i = 0
      while (i < bytes.length) {
        st = next(st * 256 + (bytes(i) & 0xff))
        total += cnt(st)
        i += 1
      }
      total
    }

    /** Number of DISTINCT patterns occurring at least once. `seen` is a
      * caller-provided scratch array (≥ nPatterns), cleared here — the
      * codegen path reuses one per-task buffer to stay allocation-free. */
    def distinctTerms(s: UTF8String, seen: Array[Boolean]): Long = {
      java.util.Arrays.fill(seen, 0, pats.length, false)
      val bytes = s.getBytes
      var st = 0; var found = 0L; var i = 0
      while (i < bytes.length) {
        st = next(st * 256 + (bytes(i) & 0xff))
        var o = if (endPat(st) >= 0) st else dict(st)
        while (o >= 0 && !seen(endPat(o))) {
          seen(endPat(o)) = true; found += 1
          o = dict(o)
        }
        // once every pattern on this chain is seen, later positions stop
        // at the first already-seen link — amortized O(matches)
        i += 1
      }
      found
  }
}

/** Shannon character entropy in integer micro-nats — the cheap
  * compression-ratio proxy for gibberish/binary-spill detection (low
  * entropy = repeated filler, high = random bytes; natural text sits in a
  * band). ONE byte pass builds a 256-bucket histogram, then ≤256 log
  * terms: each term is the pinned pipeline
  * round(n_b · (ln n − ln n_b) · 10^6 / n) — integer-summed, so the
  * result is exact-per-input and a positional SQL oracle replays it.
  * Byte entropy ≡ character entropy on ASCII; on multi-byte text it is
  * byte-level (deterministic either way, documented). */
object CharEntropyOps {
  def entropyMicroNats(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val hist = new Array[Int](256)
    var i = 0
    while (i < n) { hist(bytes(i) & 0xff) += 1; i += 1 }
    val lnN = math.log(n.toDouble)
    var total = 0L
    var b = 0
    while (b < 256) {
      val c = hist(b)
      if (c > 0)
        total += math.round(c * (lnN - math.log(c.toDouble)) * 1000000.0 / n)
      b += 1
    }
    total
  }
}

/** Codegen scalar wrapper for [[CharEntropyOps.entropyMicroNats]]. */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropyOps.entropyMicroNats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharEntropyOps.entropyMicroNats($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** Codegen scalar: total blocklist occurrences in the input string. */
case class BlocklistHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "blocklist_hits"

  @transient private lazy val auto = new AhoCorasick(patterns)

  override protected def nullSafeEval(input: Any): Any =
    auto.countAll(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAuto", auto,
      "graft.functions.AhoCorasick")
    defineCodeGen(ctx, ev, c => s"$ref.countAll($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistHits =
    copy(child = newChild)
}

/** Codegen scalar: distinct blocklist patterns present in the input. */
case class BlocklistTerms(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "blocklist_terms"

  @transient private lazy val auto = new AhoCorasick(patterns)
  @transient private lazy val scratch = new Array[Boolean](patterns.length)

  override protected def nullSafeEval(input: Any): Any =
    auto.distinctTerms(input.asInstanceOf[UTF8String], scratch)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAuto", auto,
      "graft.functions.AhoCorasick")
    val seen = ctx.addMutableState("boolean[]", "acSeen",
      v => s"$v = new boolean[${patterns.length}];")
    defineCodeGen(ctx, ev, c => s"$ref.distinctTerms($c, $seen)")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistTerms =
    copy(child = newChild)
}

object CharEntropyFn {
  private[graft] val builders: GraftRegistry.Builders = Seq(
    "graft_char_entropy" -> (exprs => CharEntropy(exprs.head)))

  def register(spark: SparkSession): Unit =
    GraftRegistry.registerTemp(spark, builders)

  /** Column helper; requires `register(spark)`. */
  def charEntropy(c: Column): Column =
    call_function("graft_char_entropy", c)
}

object Blocklist {
  /** Patterns arrive as ONE comma-separated string literal (foldable),
    * decoded at expression-build time — the automaton is constructed once,
    * never per row (same discipline as the classifier weight table). */
  private[graft] val builders: GraftRegistry.Builders = Seq(
    "graft_blocklist_hits" -> (exprs => BlocklistHits(exprs.head,
      exprs(1).eval(null).toString.split(',').toSeq)),
    "graft_blocklist_terms" -> (exprs => BlocklistTerms(exprs.head,
      exprs(1).eval(null).toString.split(',').toSeq)))

  def register(spark: SparkSession): Unit =
    GraftRegistry.registerTemp(spark, builders)

  /** Column helpers; require `register(spark)`. Patterns must not
    * contain commas (the builder's wire format). */
  def blocklistHits(c: Column, patterns: Seq[String]): Column = {
    require(patterns.forall(p => p.nonEmpty && !p.contains(",")))
    call_function("graft_blocklist_hits", c, lit(patterns.mkString(",")))
  }

  def blocklistTerms(c: Column, patterns: Seq[String]): Column = {
    require(patterns.forall(p => p.nonEmpty && !p.contains(",")))
    call_function("graft_blocklist_terms", c, lit(patterns.mkString(",")))
  }
}
