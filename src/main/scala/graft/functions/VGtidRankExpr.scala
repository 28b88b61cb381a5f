package graft.functions

import graft.core.VGtid
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expression: LWW rank of a serialized VGtid — the max transaction
  * id across the position's UUID intervals (see [[graft.core.VGtid.rank]]).
  * Within one shard (fixed writer UUID set) this rank orders positions the
  * same way the reference's containment comparison does
  * (`cmd/internal/planetscale_edge_database.go:617-652`), but is a plain LONG
  * usable in window ORDER BY / sort-merge without object allocation games.
  *
  * Codegen: emits a static call — stays inside whole-stage codegen rather
  * than falling back to interpreted eval.
  */
case class VGtidRankExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    VGtidRankExpr.rankUtf8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VGtidRankExpr.rankUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): VGtidRankExpr =
    copy(child = newChild)
}

/** Catalyst expression: the reference's string-level position comparison
  * (`positionAfter` when `after = true`, else `positionEqual`;
  * `planetscale_edge_database.go:617-652`) — blank or malformed positions
  * never compare after/equal. Full interval-set containment, NOT the rank
  * shortcut (multi-UUID sets compare correctly). Static-call codegen.
  */
case class VGtidCompareExpr(left: Expression, right: Expression, after: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullSafeEval(l: Any, r: Any): Any =
    VGtidCompareExpr.compare(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], after)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.VGtidCompareExpr.compare($l, $r, $after)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VGtidCompareExpr =
    copy(left = newLeft, right = newRight)
}

object VGtidCompareExpr {
  def compare(l: UTF8String, r: UTF8String, after: Boolean): Boolean =
    if (after) VGtid.positionAfter(l.toString, r.toString)
    else VGtid.positionEqual(l.toString, r.toString)

  import org.apache.spark.sql.GraftBridge
  def vgtid_after(x: Column, y: Column): Column =
    GraftBridge.column(VGtidCompareExpr(GraftBridge.expression(x), GraftBridge.expression(y), after = true))
  def vgtid_equal(x: Column, y: Column): Column =
    GraftBridge.column(VGtidCompareExpr(GraftBridge.expression(x), GraftBridge.expression(y), after = false))
}

object VGtidRankExpr {
  /** Hot-path rank: scans the UTF8 bytes for the max integer run — avoids the
    * full interval-set parse (`VGtid.parse`) per row. Falls back to the exact
    * parser if the fast scan sees nothing numeric.
    */
  def rankUtf8(s: UTF8String): Long = {
    val bytes = s.getBytes
    var max = 0L
    var cur = 0L
    var inNum = false
    // transaction ids appear only after the first ':' of each ','-separated
    // part (before that is the server UUID, whose hex contains digit runs)
    var afterColon = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ',') { if (inNum && cur > max) max = cur; cur = 0L; inNum = false; afterColon = false }
      else if (b == ':') { if (inNum && cur > max) max = cur; cur = 0L; inNum = false; afterColon = true }
      else if (afterColon && b >= '0' && b <= '9') { cur = cur * 10 + (b - '0'); inNum = true }
      else { if (inNum && cur > max) max = cur; cur = 0L; inNum = false }
      i += 1
    }
    if (inNum && cur > max) max = cur
    max
  }

  import org.apache.spark.sql.GraftBridge
  def vgtid_rank(c: Column): Column =
    GraftBridge.column(VGtidRankExpr(GraftBridge.expression(c)))
}
