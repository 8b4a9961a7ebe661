package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-shape feature (reference semantics:
  * `sciencebeam_parser/models/data.py:360-382`): each char maps to a
  * class — digit→'d', upper→'X', lower→'x', anything else→itself —
  * keeping the first char and last two chars verbatim (class-mapped) and
  * collapsing consecutive duplicate classes in the middle.
  * `"Quick123"` → `"Xx1d23"`-style signatures used as CRF features.
  *
  * Implemented as a native Catalyst expression (not a Scala UDF) so it
  * stays inside whole-stage codegen: `doGenCode` emits a static call,
  * no closure serialization, null handling inherited from
  * `UnaryExpression`.
  */
object WordShape {

  private def charShape(ch: Char): String =
    if (Character.isDigit(ch)) "d"
    else if (Character.isLetter(ch)) { if (Character.isUpperCase(ch)) "X" else "x" }
    else ch.toString

  /** Static shape function, called from both eval and generated code. */
  def shape(text: String): String = {
    if (text == null) return null
    val s = text.map(charShape)
    val prefix = s.take(1)
    val middle = s.slice(1, math.max(1, s.length - 2))
    val suffix = s.drop(1).takeRight(2)
    val dedup = new StringBuilder
    var last: String = null
    middle.foreach { c => if (c != last) { dedup.append(c); last = c } }
    (prefix ++ Seq(dedup.toString) ++ suffix).mkString
  }

  /** Column API entry point. */
  def word_shape(c: Column): Column =
    ColumnBridge.column(WordShapeExpr(ColumnBridge.expression(c)))
}

case class WordShapeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "word_shape"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(WordShape.shape(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.WordShape.shape($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): WordShapeExpr =
    copy(child = newChild)
}
