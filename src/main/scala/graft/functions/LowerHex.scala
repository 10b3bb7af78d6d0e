package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** graft_lower_hex(v BIGINT) → STRING: the unsigned lowercase hex form of a
  * long — BIT-IDENTICAL to the composed `lower(hex(v))` (Spark's hex(long)
  * is unsigned uppercase with no zero padding; `Long.toHexString` is the
  * same digits lowercased), which remains the oracle-mirrored definition of
  * record. One string allocation instead of three (hex string, lower copy,
  * plus hex's internal buffer) per minted IRI in the flagship decode —
  * round 6 guide §4; runs per Mint-tagged subject/object at ~26M rows per
  * bench corpus. NULL in → NULL out. Pinned against the composed form by
  * CodegenPinSpec under CODEGEN_ONLY and NO_CODEGEN. */
case class LowerHex(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_lower_hex expects BIGINT, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lower_hex"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.lang.Long.toHexString(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(java.lang.Long.toHexString($c))")

  override protected def withNewChildInternal(newChild: Expression): LowerHex = copy(newChild)
}

object LowerHex {
  def apply(c: Column): Column = GraftBridge.column(LowerHex(GraftBridge.expression(c)))
}
