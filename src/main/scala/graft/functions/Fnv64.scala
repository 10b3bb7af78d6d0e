package graft.functions

import graft.operators.Emitter
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the pipeline's FNV-1a 64-bit content hash
  * (the skolemization primitive, SURVEY.md §7.4.1), with whole-stage codegen.
  *
  * This is the (b)-tier extension point of the operator preference ladder:
  * a scalar the built-in function set lacks (xxhash64 exists but is not the
  * hash the emitter's IRIs are derived from), implemented as an `Expression`
  * with `doGenCode` so it stays inside WholeStageCodegen instead of falling
  * out to a Scala UDF. Registered as SQL function `graft_fnv64` via
  * [[GraftExtensions]] (SparkSessionExtensions.injectFunction).
  */
case class Fnv64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_fnv64 expects STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fnv64"

  override def nullSafeEval(input: Any): Any =
    Fnv64.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv64.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fnv64 = copy(newChild)
}

object Fnv64 {
  /** Same bytes-level definition as the emitter's hash (Emitter.fnv64). */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def apply(c: Column): Column = GraftBridge.column(Fnv64(GraftBridge.expression(c)))
}

/** spark.sql.extensions entry point: registers the graft SQL functions.
  * Usage: .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * or GraftExtensions.register(spark). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.fnv64Descriptor)
    ext.injectFunction(GraftExtensions.bandedSigDescriptor)
    ext.injectFunction(GraftExtensions.quantDotDescriptor)
    ext.injectFunction(GraftExtensions.quantNormDescriptor)
    ext.injectFunction(GraftExtensions.quantL2Descriptor)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types.IntegerType

  val fnv64Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_fnv64"),
    new ExpressionInfo(classOf[Fnv64].getName, "graft_fnv64"),
    (exprs: Seq[Expression]) => Fnv64(exprs.head))

  /** SQL surface of [[BandedSig]]:
    * graft_banded_sig(emb ARRAY<FLOAT>, nBands INT, bitsPerBand INT, dims INT)
    * → ARRAY<BIGINT>. The shape parameters must be INT literals (they fix
    * the generated code and the plane-weight table). */
  val bandedSigDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_banded_sig"),
    new ExpressionInfo(classOf[BandedSig].getName, "graft_banded_sig"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 4,
        "graft_banded_sig(emb, nBands, bitsPerBand, dims) takes 4 arguments")
      def intLit(e: Expression, name: String): Int = e match {
        case Literal(v: Int, IntegerType) => v
        case _ => throw new IllegalArgumentException(s"graft_banded_sig: $name must be an INT literal")
      }
      BandedSig(exprs.head, intLit(exprs(1), "nBands"),
        intLit(exprs(2), "bitsPerBand"), intLit(exprs(3), "dims"))
    })

  /** SQL surfaces of the quantized scoring primitives (QuantOps.scala). */
  val quantDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_quant_dot"),
    new ExpressionInfo(classOf[QuantDot].getName, "graft_quant_dot"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "graft_quant_dot(a, b) takes 2 arguments")
      QuantDot(exprs.head, exprs(1))
    })

  val quantNormDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_quant_norm"),
    new ExpressionInfo(classOf[QuantNorm].getName, "graft_quant_norm"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "graft_quant_norm(a) takes 1 argument")
      QuantNorm(exprs.head)
    })

  val quantL2Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_quant_l2"),
    new ExpressionInfo(classOf[QuantL2].getName, "graft_quant_l2"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "graft_quant_l2(a, b) takes 2 arguments")
      QuantL2(exprs.head, exprs(1))
    })

  /** Register on an existing session (no spark.sql.extensions config needed). */
  def register(spark: SparkSession): Unit =
    Seq(fnv64Descriptor, bandedSigDescriptor, quantDotDescriptor,
        quantNormDescriptor, quantL2Descriptor)
      .foreach { d =>
        spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
      }
}
