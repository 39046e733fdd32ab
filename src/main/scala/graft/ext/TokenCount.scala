package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace-token count of a string WITHOUT materializing the token
  * array: `size(split(text, ' '))` — the single most common scalar in this
  * engine (every quality ratio denominator, every token budget) — builds
  * an `array<string>` per row just to read its length. This is a codegen'd
  * single byte-scan instead: count 0x20 bytes + 1 (a space byte never
  * occurs inside a UTF-8 multibyte sequence, so byte scan ≡ char scan).
  *
  * Exactly `size(split(text, ' ', -1))` for non-null input: split on the
  * single-space regex keeps empty tokens ("a  b" → 3, "a " → 2, "" → 1),
  * which is spaces+1. [[RewriteTokenCount]] applies the rewrite
  * plan-wide as an optimizer rule, so call sites keep the declarative
  * formulation. */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override def nullSafeEval(v: Any): Any =
    TokenCount.count(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ext.TokenCount.count($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCount {
  /** spaces + 1, by byte scan. */
  def count(s: UTF8String): Int = {
    val nb = s.numBytes
    var n = 1
    var i = 0
    while (i < nb) {
      if (s.getByte(i) == 0x20) n += 1
      i += 1
    }
    n
  }

  def tokenCount(text: Column): Column =
    ColumnBridge.column(TokenCount(ColumnBridge.expression(text)))
}

/** Optimizer rule: rewrite `size(split(text, ' ', -1))` to [[TokenCount]].
  * Guarded on the exact pattern — single-space regex, limit -1, and
  * non-legacy `size` null semantics (legacy `size(null) = -1` differs from
  * the expression's null-propagating contract). Injected by
  * [[graft.GraftExtensions]]; the Verify/Bench sessions enable the
  * extension, so every oracle hash-match also certifies the rewrite. */
object RewriteTokenCount extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Literal, Size, StringSplit}

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(StringSplit(text, Literal(sep: UTF8String, _), Literal(-1, _)),
          false) if sep != null && sep.toString == " " =>
        TokenCount(text)
    }
}
