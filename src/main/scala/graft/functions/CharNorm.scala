package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused ASCII fingerprint normalization — t4's hot loop
  * (reference: the content-addressed dedup idea behind the md5 usage
  * in tests/query/function, recast for corpus text):
  *
  *   `regexp_replace(lower(regexp_replace(text, "[^A-Za-z0-9 ]", "")),
  *                   " +", " ")`
  *
  * as ONE linear byte pass with no regex machinery and no
  * intermediate strings. The three-stage regex form allocates two
  * full-length intermediates per document and runs `java.util.regex`
  * twice; measured at sf10 (500 k docs) the regex chain was the
  * whole cost of t4 (24.6 s for the first regexp_replace alone vs
  * 0.25 s for the scan), and its per-byte cost COLLAPSED under
  * concurrent tasks (allocation-bound). This pass writes each
  * surviving byte once: ~10× on the battery shape.
  *
  * Byte-level processing is exact for the char-class semantics:
  * every byte of a multi-byte UTF-8 sequence has the high bit set,
  * so non-ASCII characters are stripped wholly, matching the regex's
  * per-CHARACTER class test, and `lower` only ever sees ASCII
  * (everything else was stripped first — A-Z is a fixed +32).
  * Space-run collapse emits one space per maximal run, no trim —
  * exactly the `" +" → " "` rule (leading/trailing runs survive as
  * single spaces). Null propagates null; empty maps to empty. */
case class NormalizeAscii(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"normalize_ascii expects STRING, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val out = new Array[Byte](n)
    var o = 0
    var lastSpace = false
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        out(o) = b; o += 1; lastSpace = false
      } else if (b >= 'A' && b <= 'Z') {
        out(o) = (b + 32).toByte; o += 1; lastSpace = false
      } else if (b == ' ') {
        if (!lastSpace) { out(o) = ' '; o += 1; lastSpace = true }
      }
      // every other byte (incl. all bytes of multi-byte UTF-8
      // sequences) is stripped — the char class keeps only
      // [A-Za-z0-9 ]
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("normalizeAscii", this,
      classOf[NormalizeAscii].getName)
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = (org.apache.spark.unsafe.types.UTF8String)
         |  $self.evalNorm($s);
       """.stripMargin
    })
  }

  /** Codegen entry point — public so generated code can call it. */
  def evalNorm(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): NormalizeAscii =
    copy(child = newChild)
}

object CharNorm {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.Shims

  /** Column wrapper: fused strip-non-alnum + ASCII lower + collapse
    * spaces (see [[NormalizeAscii]]). */
  def normalizeAscii(s: Column): Column =
    Shims.column(NormalizeAscii(Shims.expression(s)))
}
