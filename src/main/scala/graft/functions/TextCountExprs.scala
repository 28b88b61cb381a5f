package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled single-pass character/substring counting for the text-quality
  * and language-ID operators.
  *
  * The original formulations round-tripped the document through
  * `regexp_replace`/`replace` and measured the length delta — each count was
  * a full copy of the text (and the optimizer's filter pushdown duplicates
  * the expressions above AND below the filter, doubling it again). A
  * language-ID + quality gate paid ~35 full-string passes with allocations
  * per document. These expressions compute the identical integers in one
  * allocation-free byte scan each.
  *
  * Exactness notes (the DuckDB oracles hash whole result sets):
  *  - All character classes counted here are ASCII ([A-Za-z], [0-9], the
  *    space char, `.,!?;:`, and Java-regex `\s` = [ \t\n\x0B\f\r]); in UTF-8
  *    every byte of a multi-byte codepoint is >= 0x80, so a byte scan counts
  *    exactly the chars the regexp_replace length-delta counted.
  *  - Substring occurrence counts replicate `replace`'s left-to-right
  *    non-overlapping scan; needles are ASCII so byte positions == char
  *    positions.
  */
object TextCountExprs {

  final val ClassAlpha = 0
  final val ClassDigit = 1
  final val ClassSpace = 2
  final val ClassPunct = 3
  final val ClassRegexWs = 4

  private def inClass(b: Byte, cls: Int): Boolean = (cls: @inline) match {
    case ClassAlpha => (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
    case ClassDigit => b >= '0' && b <= '9'
    case ClassSpace => b == ' '
    case ClassPunct => b == '.' || b == ',' || b == '!' || b == '?' || b == ';' || b == ':'
    case _ => b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
  }

  def countClass(s: UTF8String, cls: Int): Int = {
    val bytes = s.getBytes
    var n = 0
    var i = 0
    while (i < bytes.length) {
      if (inClass(bytes(i), cls)) n += 1
      i += 1
    }
    n
  }

  /** Non-overlapping left-to-right occurrence count (replace() semantics). */
  def countOccurrences(text: UTF8String, needle: Array[Byte]): Long = {
    if (needle.length == 0) return 0L
    val hay = text.getBytes
    var count = 0L
    var i = 0
    val limit = hay.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) { count += 1; i += needle.length }
      else i += 1
    }
    count
  }

  /** `size(split(trim(text), "\\s+"))` over a non-blank trimmed string,
    * replicated exactly: trim strips ASCII spaces only; Java `split` with
    * limit -1 yields (ws-runs + 1) fields including empty edge fields from
    * leading/trailing non-space whitespace. Blank-after-trim → 0 (the
    * `when(length(trim)===0, 0)` guard).
    */
  def wsTokenCount(s: UTF8String): Long = {
    val bytes = s.getBytes
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    if (lo == hi) return 0L
    var runs = 0L
    var inRun = false
    var i = lo
    while (i < hi) {
      val ws = inClass(bytes(i), ClassRegexWs)
      if (ws && !inRun) { runs += 1; inRun = true }
      else if (!ws) inRun = false
      i += 1
    }
    runs + 1L
  }

  def classCount(text: Column, cls: Int): Column =
    GraftBridge.column(CharClassCountExpr(GraftBridge.expression(text), cls))

  def occurrences(text: Column, needle: String): Column =
    GraftBridge.column(CountOccurrencesExpr(GraftBridge.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(needle)))

  def wsTokens(text: Column): Column =
    GraftBridge.column(WsTokenCountExpr(GraftBridge.expression(text)))
}

/** Count of chars in an ASCII class (see [[TextCountExprs]]); IntegerType to
  * match `length(regexp_replace(...))`'s type in downstream arithmetic.
  */
case class CharClassCountExpr(child: Expression, cls: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
    }
  }
  override def nullSafeEval(v: Any): Any =
    TextCountExprs.countClass(v.asInstanceOf[UTF8String], cls)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCountExprs.countClass($c, $cls)")
  override protected def withNewChildInternal(newChild: Expression): CharClassCountExpr =
    copy(child = newChild)
}

/** Non-overlapping substring occurrence count; LongType to match the
  * `(length - length(replace)) / n` formulation's cast.
  */
case class CountOccurrencesExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"expected (string, string), got $other")
    }
  }
  override def nullSafeEval(text: Any, needle: Any): Any =
    TextCountExprs.countOccurrences(text.asInstanceOf[UTF8String],
      needle.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.TextCountExprs.countOccurrences($t, $n.getBytes())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountOccurrencesExpr =
    copy(left = l, right = r)
}

/** Whitespace token count (split-semantics; see [[TextCountExprs.wsTokenCount]]). */
case class WsTokenCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
    }
  }
  override def nullSafeEval(v: Any): Any =
    TextCountExprs.wsTokenCount(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCountExprs.wsTokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): WsTokenCountExpr =
    copy(child = newChild)
}
