package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expressions for the integer-quantized embedding scoring
  * primitives (the q23/q27 hot path: one evaluation per CANDIDATE PAIR).
  *
  * Bit-identical to the composed-builtins forms in [[AnnOps]]
  * (`quantDotComposed` / `quantNormComposed`, kept as the cross-check the
  * suite pins these against) and to the exploded relational build mirrored
  * by the DuckDB oracle:
  *   - quantization `floor(e * 1000)` widens to DOUBLE before multiplying
  *     (see [[QuantOps.qz]] — Spark 4 ANSI coercion and DuckDB both promote
  *     float·int to double);
  *   - NaN / out-of-long-range positions quantize to 0 (the TOTAL-function
  *     guard — the literal bounds are the same doubles the composed form
  *     compares against, so the cut-off point is identical);
  *   - null positions are skipped; if NO usable position exists the result
  *     is NULL — SQL SUM-over-a-join semantics, so all-NULL/empty garbage
  *     arrays fail threshold filters instead of scoring 0;
  *   - the fold runs in array order, all-long, so the result is exact and
  *     aggregation-order-free (long overflow wraps like Java — it cannot
  *     abort a job, unlike an ANSI-mode overflow in the composed form).
  *
  * The composed forms evaluate their guard branches through Catalyst
  * expression trees and re-evaluate the product array for the NULL-iff-empty
  * rule; these run one fused Java loop per row inside WholeStageCodegen —
  * measured ~3x on q23's candidate scoring at sf0.1.
  */
object QuantOps {

  /** The shared quantization step. The multiply WIDENS TO DOUBLE first:
    * Spark 4's ANSI type coercion promotes float·int to DOUBLE (not float —
    * AnsiTypeCoercion, unlike the legacy tightest-common-type rule), and
    * DuckDB does the same, so a float multiply would round differently on
    * values near an integer boundary (e.g. -0.0010000001f: float product
    * rounds to exactly -1.0 → floor -1, double product -1.0000000475 →
    * floor -2). Same guard literals as the composed form so the
    * out-of-range cut-off is bit-identical. */
  @inline def qz(x: Float): Long = {
    val d = x.toDouble * 1000.0
    if (java.lang.Double.isNaN(d) || d < -9.223372036854775e18 || d > 9.223372036854775e18) 0L
    else math.floor(d).toLong
  }

  /** codegen fragment computing `qz` into `out` from float `in`.
    *
    * Every physical line is a complete statement: Spark's codegen `Block`
    * machinery treats a leading `|` on any line of an interpolated fragment
    * as a margin to strip, so a multi-line expression whose continuation
    * line begins with `||` reaches Janino with the operator eaten
    * ("Expression ... is not a type"). Statement-per-line keeps the
    * fragment immune to that stripping. Pinned by FunctionsSpec's
    * CODEGEN_ONLY suite. */
  private[functions] def qzJava(in: String, out: String): String =
    s"""double ${out}_d = ((double) $in) * 1000.0;
       |long $out = 0L;
       |if (!java.lang.Double.isNaN(${out}_d) && ${out}_d >= -9.223372036854775E18 && ${out}_d <= 9.223372036854775E18) { $out = (long) java.lang.Math.floor(${out}_d); }""".stripMargin
}

/** graft_quant_dot(a ARRAY<FLOAT>, b ARRAY<FLOAT>) → BIGINT (nullable):
  * Σ qz(a_p)·qz(b_p) over positions where both are non-null; NULL if none. */
case class QuantDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"graft_quant_dot expects ARRAY<FLOAT> x2, got $l, $r")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // all-null arrays yield NULL even from non-null inputs
  override def prettyName: String = "graft_quant_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var usable = 0
    var p = 0
    while (p < n) {
      if (!x.isNullAt(p) && !y.isNullAt(p)) {
        usable += 1
        dot += QuantOps.qz(x.getFloat(p)) * QuantOps.qz(y.getFloat(p))
      }
      p += 1
    }
    if (usable == 0) null else java.lang.Long.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val usable = ctx.freshName("usable")
      val p = ctx.freshName("p")
      val qa = ctx.freshName("qa")
      val qb = ctx.freshName("qb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |int $usable = 0;
         |for (int $p = 0; $p < $n; $p++) {
         |  if (!$a.isNullAt($p) && !$b.isNullAt($p)) {
         |    $usable++;
         |    ${QuantOps.qzJava(s"$a.getFloat($p)", qa)}
         |    ${QuantOps.qzJava(s"$b.getFloat($p)", qb)}
         |    $dot += $qa * $qb;
         |  }
         |}
         |if ($usable == 0) { ${ev.isNull} = true; } else { ${ev.value} = $dot; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QuantDot =
    copy(left = newLeft, right = newRight)
}

object QuantDot {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(QuantDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** graft_quant_l2(a ARRAY<FLOAT>, b ARRAY<FLOAT>) → BIGINT (nullable):
  * Σ (qz(a_p) - qz(b_p))² over positions where both are non-null; NULL if
  * none — the IVF assignment distance (integer-exact squared L2). */
case class QuantL2(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"graft_quant_l2 expects ARRAY<FLOAT> x2, got $l, $r")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quant_l2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var ss = 0L
    var usable = 0
    var p = 0
    while (p < n) {
      if (!x.isNullAt(p) && !y.isNullAt(p)) {
        usable += 1
        val d = QuantOps.qz(x.getFloat(p)) - QuantOps.qz(y.getFloat(p))
        ss += d * d
      }
      p += 1
    }
    if (usable == 0) null else java.lang.Long.valueOf(ss)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val ss = ctx.freshName("ss")
      val usable = ctx.freshName("usable")
      val p = ctx.freshName("p")
      val qa = ctx.freshName("qa")
      val qb = ctx.freshName("qb")
      val diff = ctx.freshName("diff")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $ss = 0L;
         |int $usable = 0;
         |for (int $p = 0; $p < $n; $p++) {
         |  if (!$a.isNullAt($p) && !$b.isNullAt($p)) {
         |    $usable++;
         |    ${QuantOps.qzJava(s"$a.getFloat($p)", qa)}
         |    ${QuantOps.qzJava(s"$b.getFloat($p)", qb)}
         |    long $diff = $qa - $qb;
         |    $ss += $diff * $diff;
         |  }
         |}
         |if ($usable == 0) { ${ev.isNull} = true; } else { ${ev.value} = $ss; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QuantL2 =
    copy(left = newLeft, right = newRight)
}

object QuantL2 {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(QuantL2(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** graft_quant_l2q(a ARRAY<BIGINT>, b ARRAY<BIGINT>) → BIGINT (nullable):
  * squared L2 over two PRE-quantized element arrays — the k-means assignment
  * distance, where the quantized array is kept per row for the centroid
  * update and the composed form
  * `aggregate(zip_with(q, c, (x,y) -> (x-y)*(x-y)), 0L, (acc,v) -> acc+v)`
  * evaluated as an interpreted CodegenFallback tree allocating a zipped
  * array per (row, centroid) pair. Exact semantics of that composed form,
  * which differ from [[QuantL2]]'s skip-nulls rule:
  *   - zip_with pads the shorter array with nulls, and the fold poisons on
  *     the first null product, so a LENGTH MISMATCH or ANY null element
  *     yields NULL (QuantL2 instead skips unusable positions);
  *   - two empty arrays yield 0 (the fold's seed), not NULL;
  *   - long overflow WRAPS like Java — the house posture of QuantDot /
  *     QuantL2 (it cannot abort a job, unlike an ANSI-mode overflow in the
  *     composed form; quantized element magnitudes keep real inputs far
  *     from the boundary).
  * Pinned against the composed form by CodegenPinSpec under CODEGEN_ONLY. */
case class QuantL2Q(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"graft_quant_l2q expects ARRAY<BIGINT> x2, got $l, $r")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quant_l2q"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var ss = 0L
    var p = 0
    while (p < n) {
      if (x.isNullAt(p) || y.isNullAt(p)) return null
      val d = x.getLong(p) - y.getLong(p)
      ss += d * d
      p += 1
    }
    java.lang.Long.valueOf(ss)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val ss = ctx.freshName("ss")
      val p = ctx.freshName("p")
      val diff = ctx.freshName("diff")
      s"""
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  int $n = $a.numElements();
         |  long $ss = 0L;
         |  for (int $p = 0; $p < $n && !${ev.isNull}; $p++) {
         |    if ($a.isNullAt($p) || $b.isNullAt($p)) { ${ev.isNull} = true; }
         |    else {
         |      long $diff = $a.getLong($p) - $b.getLong($p);
         |      $ss += $diff * $diff;
         |    }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $ss; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QuantL2Q =
    copy(left = newLeft, right = newRight)
}

object QuantL2Q {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(QuantL2Q(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** graft_quant_norm(a ARRAY<FLOAT>) → BIGINT (nullable):
  * floor(sqrt(Σ qz(a_p)²)) over non-null positions; NULL if none. */
case class QuantNorm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_quant_norm expects ARRAY<FLOAT>, got $t")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quant_norm"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ss = 0L
    var usable = 0
    var p = 0
    while (p < n) {
      if (!x.isNullAt(p)) {
        usable += 1
        val q = QuantOps.qz(x.getFloat(p))
        ss += q * q
      }
      p += 1
    }
    if (usable == 0) null
    else java.lang.Long.valueOf(math.floor(math.sqrt(ss.toDouble)).toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val ss = ctx.freshName("ss")
      val usable = ctx.freshName("usable")
      val p = ctx.freshName("p")
      val q = ctx.freshName("q")
      s"""
         |int $n = $c.numElements();
         |long $ss = 0L;
         |int $usable = 0;
         |for (int $p = 0; $p < $n; $p++) {
         |  if (!$c.isNullAt($p)) {
         |    $usable++;
         |    ${QuantOps.qzJava(s"$c.getFloat($p)", q)}
         |    $ss += $q * $q;
         |  }
         |}
         |if ($usable == 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = (long) java.lang.Math.floor(java.lang.Math.sqrt((double) $ss)); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantNorm = copy(newChild)
}

object QuantNorm {
  def apply(a: Column): Column = GraftBridge.column(QuantNorm(GraftBridge.expression(a)))
}
