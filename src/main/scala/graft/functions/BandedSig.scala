package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression for the banded sign-LSH signature: one pass
  * over the embedding array per row, returning `array<long>` of length
  * `nBands` (element b = that band's bucket id).
  *
  * This replaces the relational signature build (posexplode → broadcast plane
  * join → two shuffled groupBys, `AnnOps.bandedSignatureRelational`) with a
  * narrow per-row computation — the VERDICT r2 efficiency fix for
  * q23/q27: the O(n·dims) intermediate row explosion and both pre-candidate
  * shuffles disappear; at 10^9-vector scale the signature becomes a pure map
  * stage. Semantics are bit-identical to the relational path (pinned by
  * FunctionsSpec):
  *   - quantization `floor(e * 1000)` widens to DOUBLE before multiplying —
  *     Spark 4's ANSI coercion for `col("e") * 1000` on a float column
  *     promotes float·int to double (AnsiTypeCoercion), as does DuckDB; a
  *     float multiply rounds differently near integer boundaries;
  *   - plane weights ±1 derived from the portable md5 hash
  *     h32("hp<j>:<pos>") — identical in Spark, DuckDB, and here;
  *   - proj(j) = Σ_d w(j,d)·ei(d); bucket(b) = Σ_i [proj(b·bits+i) ≥ 0]·2^i.
  */
case class BandedSig(child: Expression, nBands: Int, bitsPerBand: Int, dims: Int)
    extends UnaryExpression {

  private def nPlanes = nBands * bitsPerBand

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_banded_sig expects ARRAY<FLOAT>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_banded_sig"

  @transient private lazy val weights: Array[Byte] = BandedSig.flatWeights(nPlanes, dims)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val w = weights
    val proj = new Array[Long](nPlanes)
    val n = math.min(dims, arr.numElements())
    var d = 0
    var seen = 0
    while (d < n) {
      if (!arr.isNullAt(d)) {
        seen += 1
        val ei = math.floor(arr.getFloat(d).toDouble * 1000.0).toLong
        var j = 0
        while (j < nPlanes) { proj(j) += w(j * dims + d) * ei; j += 1 }
      }
      d += 1
    }
    val buckets = new Array[Long](nBands)
    // zero usable elements => all buckets 0, matching the relational build
    // (SUM over an all-NULL group is NULL, and its bucket CASE yields 0) —
    // NOT the all-bits bucket that proj==0 would set
    if (seen > 0) {
      var b = 0
      while (b < nBands) {
        var v = 0L
        var i = 0
        while (i < bitsPerBand) { if (proj(b * bitsPerBand + i) >= 0) v |= 1L << i; i += 1 }
        buckets(b) = v
        b += 1
      }
    }
    new GenericArrayData(buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val w = ctx.addReferenceObj("bandedWeights", weights, "byte[]")
      val proj = ctx.freshName("proj")
      val buckets = ctx.freshName("buckets")
      val n = ctx.freshName("n")
      val ei = ctx.freshName("ei")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val seen = ctx.freshName("seen")
      s"""
         |long[] $proj = new long[$nPlanes];
         |int $n = java.lang.Math.min($dims, $c.numElements());
         |int $seen = 0;
         |for (int $d = 0; $d < $n; $d++) {
         |  if (!$c.isNullAt($d)) {
         |    $seen++;
         |    long $ei = (long) java.lang.Math.floor(((double) $c.getFloat($d)) * 1000.0);
         |    for (int $j = 0; $j < $nPlanes; $j++) $proj[$j] += $w[$j * $dims + $d] * $ei;
         |  }
         |}
         |long[] $buckets = new long[$nBands];
         |if ($seen > 0) {
         |  for (int $b = 0; $b < $nBands; $b++) {
         |    long $v = 0L;
         |    for (int $i = 0; $i < $bitsPerBand; $i++)
         |      if ($proj[$b * $bitsPerBand + $i] >= 0L) $v |= (1L << $i);
         |    $buckets[$b] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($buckets);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BandedSig =
    copy(child = newChild)
}

object BandedSig {

  /** ±1 plane weights flattened as (j·dims + d), derived from the portable
    * md5-based h32 hash — the same derivation as `AnnOps.planes` (Spark) and
    * the DuckDB oracle CTE: w = +1 iff h32("hp<j>:<d>") is odd. */
  def flatWeights(nPlanes: Int, dims: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Byte](nPlanes * dims)
    var j = 0
    while (j < nPlanes) {
      var d = 0
      while (d < dims) {
        md.reset()
        val hex = md.digest(s"hp$j:$d".getBytes("UTF-8"))
          .take(4).map(b => f"$b%02x").mkString
        out(j * dims + d) = if (java.lang.Long.parseLong(hex, 16) % 2 == 1) 1 else -1
        d += 1
      }
      j += 1
    }
    out
  }

  def apply(emb: Column, nBands: Int, bitsPerBand: Int, dims: Int): Column =
    GraftBridge.column(BandedSig(GraftBridge.expression(emb), nBands, bitsPerBand, dims))
}
