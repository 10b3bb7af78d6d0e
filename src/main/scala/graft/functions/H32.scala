package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** graft_h32(s STRING) → BIGINT: the portable 32-bit token hash — the first
  * 4 bytes of md5(s) as an unsigned integer. BIT-IDENTICAL to the composed
  * form `conv(substring(md5(s), 1, 8), 16, 10)::long` that the DuckDB
  * oracles mirror (the first 8 hex chars ARE the first 4 digest bytes), but
  * computed straight from the digest: the composed chain allocates the
  * 32-char hex string, a substring and conv's radix parse PER CALL — this
  * is one digest into a thread-cached MessageDigest and four shifts (round
  * 6, guide §4; h32 runs per shingle/token in q12/q13/q14/q20/q31/q32/q69/
  * q71/q82 — millions of calls per query at bench scale). NULL in → NULL
  * out, like the null-intolerant composed chain. Pinned against the
  * composed form by CodegenPinSpec under CODEGEN_ONLY and NO_CODEGEN. */
case class H32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_h32 expects STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h32"

  override def nullSafeEval(input: Any): Any =
    H32.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H32.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): H32 = copy(newChild)
}

object H32 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** first 4 md5 digest bytes, big-endian, as an unsigned 32-bit value */
  def hashBytes(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val out = d.digest(bytes)
    ((out(0) & 0xffL) << 24) | ((out(1) & 0xffL) << 16) |
      ((out(2) & 0xffL) << 8) | (out(3) & 0xffL)
  }

  def apply(c: Column): Column = GraftBridge.column(H32(GraftBridge.expression(c)))
}
