package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** graft_lev_banded(a STRING, b STRING, k INT) → INT: Ukkonen-banded edit
  * distance with threshold k — EXACTLY `levenshtein(a, b)` whenever that
  * distance is ≤ k, and k+1 (a sentinel strictly above the band) whenever
  * it exceeds k. A thresholded dedup (`dist * 5 <= max(la, lb)` ⟺
  * `dist <= max div 5`) therefore filters and projects identically to the
  * full-matrix builtin while doing O(n·k) work instead of O(n·m) — at
  * document scale the band is ~1/5 of the matrix, and candidates whose
  * lengths already differ by more than k return without touching the DP
  * (round 6, 100-TB posture for q69's candidate→verify stage; the builtin
  * remains the oracle-mirrored definition of record). Distances compare
  * Unicode CODE POINTS, like the builtin. NULL in any argument → NULL. */
case class LevBanded(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == StringType &&
        third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lev_banded expects (STRING, STRING, INT), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lev_banded"

  override def nullSafeEval(a: Any, b: Any, k: Any): Any =
    LevBanded.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, k) => s"graft.functions.LevBanded.dist($a, $b, $k)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): LevBanded =
    copy(newFirst, newSecond, newThird)
}

object LevBanded {

  /** exact levenshtein when ≤ k, else k+1; k < 0 always returns k+1
    * (nothing is within a negative band) */
  def dist(au: UTF8String, bu: UTF8String, k: Int): Int = {
    if (k < 0) return k + 1
    val a = au.toString.codePoints().toArray
    val b = bu.toString.codePoints().toArray
    val n = a.length
    val m = b.length
    if (math.abs(n - m) > k) return k + 1
    if (n == 0) return m // <= k by the length gate
    if (m == 0) return n
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    val j0 = math.min(m, k)
    while (j <= j0) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      cur(0) = if (i <= k) i else inf
      var best = cur(0)
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      var jj = lo
      while (jj <= hi) {
        var v = prev(jj - 1) + (if (a(i - 1) == b(jj - 1)) 0 else 1)
        val del = prev(jj) + 1
        if (del < v) v = del
        val ins = cur(jj - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(jj) = v
        if (v < best) best = v
        jj += 1
      }
      if (best >= inf) return inf // band saturated: distance provably > k
      val t = prev; prev = cur; cur = t
      i += 1
    }
    math.min(prev(m), inf)
  }

  def apply(a: Column, b: Column, k: Column): Column =
    GraftBridge.column(LevBanded(GraftBridge.expression(a),
      GraftBridge.expression(b), GraftBridge.expression(k)))
}
