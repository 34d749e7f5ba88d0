package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Semantically the identity, but marked non-deterministic so the
  * optimizer treats the wrapped value as opaque.
  *
  * Why this exists: when an equi-join key is a Project alias of a
  * higher-order-function expression (e.g. `array_max(transform(codebook,
  * λ)).cell AS cell` joined on `cell = pcell`), Spark's constraint
  * propagation substitutes the alias equality through the join-key
  * equality and can emit an inferred filter on the OTHER join side that
  * still references this side's input attributes. For ordinary
  * expressions the `references ⊆ output` guard rejects that filter, but
  * for lambda-bearing expressions the reference set misses attributes
  * captured inside the lambda body, so the filter lands and fails at
  * BindReferences with INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND — and only on
  * some runs, because constraint sets iterate in exprId-dependent order.
  * Wrapping the aliased key in OpaqueIdentity keeps the alias-equality
  * constraint from being generated (non-deterministic expressions
  * produce no constraints), which removes the hazard at the source.
  *
  * Evaluation and codegen delegate to the child unchanged, so plans keep
  * whole-stage codegen and results are bit-identical.
  */
case class OpaqueIdentity(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): OpaqueIdentity =
    copy(child = newChild)
  override def prettyName: String = "opaque_id"
}

object Barriers {
  /** Wrap a lambda-derived join key so no alias-equality constraint is
    * inferred from it (see [[OpaqueIdentity]]). */
  def opaque(c: Column): Column =
    GraftColumnBridge.column(OpaqueIdentity(GraftColumnBridge.expression(c)))
}
