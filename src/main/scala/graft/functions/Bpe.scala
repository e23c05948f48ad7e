package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document BPE token count as a native Catalyst expression with
  * whole-stage codegen — the hot-path form of t10's tokenizer (the
  * "native Expression beats HOF beats UDF" tier, same reasoning as
  * [[DateAddClamped]]). The first implementation folded the merge
  * table with a runtime `aggregate()` over separator-delimited
  * strings: semantically exact but interpreted per word per rule with
  * a string allocation per step (~2 s for 5k docs at sf0.1). This
  * form walks symbol SPANS over the word in place — a merged symbol
  * is always a contiguous substring of the word, so symbols are
  * (start, len) pairs in two int arrays and a rule pass is a
  * regionMatches scan: zero allocation per rule, same result
  * (spec-pinned against the separator-string reference
  * implementation, including the boundary-blocking subtlety below).
  *
  * Parameterized by the merge table (round 12): t19 applies the
  * rules LEARNED by t18 rather than the canned table, and a
  * production vocab is 30k–50k merges — far past where the
  * k-literal replace-fold expression it replaced stays plannable
  * (Catalyst tree size and codegen both grow with k; this form is
  * one expression whose rule loop is data, not plan). The table
  * rides into codegen as a reference object, so a learned vocab of
  * any size costs one object in the task closure, like t9's
  * broadcast. Per-rule cost is a span scan, so a word of s symbols
  * costs O(k·s) worst-case — the same bound as every sequential BPE
  * applier; real tables touch few rules per word.
  *
  * Replace semantics replayed exactly: one pass per rule in rank
  * order, left-to-right non-overlapping, and — because a match
  * consumes the separator AFTER its right symbol — the pair starting
  * immediately after a merge cannot match in the same pass (the
  * scan resumes one full symbol later). DuckDB's replace() and
  * Java's String.replace share these semantics, which is what makes
  * the operator oracle-hashable.
  */
case class BpeDocTokenCount(
    child: Expression,
    merges: Seq[(String, String)] = Bpe.defaultRules) extends UnaryExpression {

  @transient private lazy val table = new Bpe.Table(merges)

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_doc_tokens expects STRING, got ${child.dataType.sql}")
  }

  override protected def nullSafeEval(t: Any): Any =
    Bpe.docTokens(t.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[Bpe.Table].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.docTokens($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_doc_tokens"
}

object Bpe {

  /** Rank-ordered BPE merge table: 48 high-frequency English merges
    * (digraph/affix pairs — the prefix of what `learn_bpe` emits on an
    * English corpus). A real deployment loads a published vocab (e.g.
    * a GPT-2-style merges.txt) into exactly this shape; the table is
    * inline so the operator and its DuckDB oracle stay self-contained.
    * Later rules reference symbols formed by earlier ones ("th e",
    * "an d", "f or", "at ion") — what makes this BPE rather than a
    * digraph counter. */
  val Merges: Seq[String] = Seq(
    "t h", "th e", "i n", "a n", "an d", "e r", "o n", "r e", "o r", "e n",
    "a t", "o u", "e d", "i s", "i t", "a l", "a r", "s t", "t o", "n t",
    "c h", "s h", "o f", "in g", "f or", "e s", "l l", "q u", "w h", "o w",
    "e a", "l e", "m e", "w e", "c k", "g h", "i on", "at ion", "t er",
    "er s", "u n", "u s", "o m", "b e", "c om", "d e", "p r", "p l")

  /** The canned table as (lhs, rhs) pairs — the default rule set and
    * the shape a learned table arrives in. */
  val defaultRules: Seq[(String, String)] = Merges.map { m =>
    val Array(a, b) = m.split(" "); (a, b)
  }

  /** A compiled merge table: parallel lhs/rhs arrays, ready for the
    * span walk. Serializable so it ships in the task closure (and as
    * a codegen reference object). */
  final class Table(rules: Seq[(String, String)]) extends Serializable {
    val ruleA: Array[String] = rules.map(_._1).toArray
    val ruleB: Array[String] = rules.map(_._2).toArray
  }

  val defaultTable: Table = new Table(defaultRules)

  /** Tokens in one (already-lowercased) word: span walk over the
    * merge table. Semantics identical to folding the rules with
    * left-to-right non-overlapping string replace on the
    * separator-delimited form — including the quirk that the symbol
    * pair immediately after a merge is blocked for the rest of that
    * rule's pass (its leading separator was consumed by the match). */
  def wordTokens(word: String, table: Table): Int = {
    val ruleA = table.ruleA; val ruleB = table.ruleB
    val n = word.length
    if (n == 0) return 0
    val starts = new Array[Int](n)
    val lens = new Array[Int](n)
    var m = n
    var i = 0
    while (i < n) { starts(i) = i; lens(i) = 1; i += 1 }
    var r = 0
    while (r < ruleA.length) {
      val a = ruleA(r); val b = ruleB(r)
      val al = a.length; val bl = b.length
      var out = 0
      i = 0
      while (i < m) {
        if (i + 1 < m && lens(i) == al && lens(i + 1) == bl &&
            word.regionMatches(starts(i), a, 0, al) &&
            word.regionMatches(starts(i + 1), b, 0, bl)) {
          starts(out) = starts(i); lens(out) = al + bl; out += 1
          if (i + 2 < m) { starts(out) = starts(i + 2); lens(out) = lens(i + 2); out += 1 }
          i += 3 // the pair after a merge cannot match this pass
        } else {
          starts(out) = starts(i); lens(out) = lens(i); out += 1
          i += 1
        }
      }
      m = out
      r += 1
    }
    m
  }

  def wordTokens(word: String): Int = wordTokens(word, defaultTable)

  /** \s as Java regex defines it — the tokenizer must split exactly
    * like `split(text, "\\s+")` and DuckDB's `string_split_regex`. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Total BPE tokens in a document: lowercase, split on \s+, sum
    * per-word counts. Called from both the interpreted and generated
    * paths. Locale.ROOT lowercase matches Spark's and DuckDB's
    * lower() on the ASCII corpus (assumption documented at m5). */
  def docTokens(text: UTF8String, table: Table): Long = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val n = s.length
    var total = 0L
    var i = 0
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) total += wordTokens(s.substring(start, i), table)
    }
    total
  }

  def docTokens(text: UTF8String): Long = docTokens(text, defaultTable)
}
