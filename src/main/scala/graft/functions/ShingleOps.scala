package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the word-shingle dedup primitives (round 6, guide
  * §4). The composed forms in [[TextOps]] — `transform(shingleSet(tk, n),
  * h32)` and `array_min(transform(hs, h -> (a*h + b) % p))` — are
  * higher-order-function trees: ArrayTransform / ArrayFilter /
  * ArrayDistinct evaluate as interpreted CodegenFallback with per-element
  * boxing, and the shingle strings materialize through concat_ws before
  * md5. At ~500 shingles × (4 + k) passes per document × millions of
  * documents, that tree is the dominant per-row cost of q12/q13/q31/q32/
  * q69's candidate generation. These run ONE fused loop per row; the
  * composed forms stay in TextOps as the oracle-mirrored definitions of
  * record, and bit-equivalence is property-pinned by FunctionsSpec under
  * CODEGEN_ONLY and NO_CODEGEN. */
object ShingleOps {

  /** [[ShingleHashes]] kernel: first-occurrence-ordered h32 values of the
    * deduped, non-empty word n-gram shingles of a token array. Shingle
    * identity is its UTF-8 byte sequence (injective ⇔ string equality);
    * concat_ws semantics: null tokens are skipped, remaining tokens joined
    * with single spaces; an all-null window yields the empty shingle,
    * which is dropped (the `!= ""` filter). Dedup happens BEFORE hashing
    * (array_distinct runs on the strings), so a cross-shingle md5
    * collision keeps its multiplicity exactly like the composed form. */
  def compute(tk: ArrayData, n: Int): ArrayData = {
    val m = tk.numElements()
    val count = m - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.HashSet[java.nio.ByteBuffer]()
    val out = new java.util.ArrayList[Any](count)
    var i = 0
    while (i < count) {
      var len = 0
      var parts = 0
      var j = 0
      while (j < n) {
        if (!tk.isNullAt(i + j)) {
          len += tk.getUTF8String(i + j).numBytes()
          parts += 1
        }
        j += 1
      }
      if (parts > 0) { // empty shingle (all-null window) drops
        val bytes = new Array[Byte](len + (parts - 1))
        var off = 0
        var first = true
        j = 0
        while (j < n) {
          if (!tk.isNullAt(i + j)) {
            if (!first) { bytes(off) = ' '; off += 1 }
            val s = tk.getUTF8String(i + j)
            s.writeToMemory(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
            off += s.numBytes()
            first = false
          }
          j += 1
        }
        if (seen.add(java.nio.ByteBuffer.wrap(bytes)))
          out.add(java.lang.Long.valueOf(H32.hashBytes(bytes)))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** [[Tokens]] kernel: maximal non-space byte runs of a string, in order —
    * exactly `filter(split(s, ' '), x -> x != '')` (split on the
    * single-space regex keeps empty segments incl. trailing ones; the
    * filter drops them all, leaving the non-empty runs). Space is a single
    * UTF-8 byte and never part of a multi-byte sequence, so the byte scan
    * is charset-exact; token UTF8Strings share the scanned byte array
    * (fromBytes with offset — no per-token copy). */
  def computeTokens(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    var count = 0
    var i = 0
    var in = false
    while (i < n) {
      if (b(i) == ' ') in = false
      else if (!in) { in = true; count += 1 }
      i += 1
    }
    val out = new Array[Any](count)
    var k = 0
    i = 0
    while (i < n) {
      if (b(i) != ' ') {
        val start = i
        while (i < n && b(i) != ' ') i += 1
        out(k) = UTF8String.fromBytes(b, start, i - start)
        k += 1
      } else i += 1
    }
    new GenericArrayData(out)
  }

  /** [[ShingleArray]] kernel: the raw word n-gram shingle STRINGS —
    * duplicates and empties preserved, exactly `transform(sequence(0,
    * size(tk)-n), i -> concat_ws(' ', tk[i], .., tk[i+n-1]))` for arrays
    * with size >= n (every caller's guard; shorter arrays yield an empty
    * result instead of the composed form's ANSI index error). */
  def computeStrings(tk: ArrayData, n: Int): ArrayData = computeStrings(tk, n, 1)

  /** strided variant: window i covers positions [i*stride, i*stride + n).
    * stride 1 = the shingle stream; stride n = the q71 fixed-chunk split
    * (`transform(sequence(0, size div n - 1), i -> array_join(slice(tk,
    * i*n+1, n), ' '))` — array_join skips null elements like concat_ws). */
  def computeStrings(tk: ArrayData, n: Int, stride: Int): ArrayData = {
    val m = tk.numElements()
    val count = if (m < n) 0 else (m - n) / stride + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val base = i * stride
      var len = 0
      var parts = 0
      var j = 0
      while (j < n) {
        if (!tk.isNullAt(base + j)) {
          len += tk.getUTF8String(base + j).numBytes()
          parts += 1
        }
        j += 1
      }
      val bytes = new Array[Byte](if (parts == 0) 0 else len + (parts - 1))
      var off = 0
      var first = true
      j = 0
      while (j < n) {
        if (!tk.isNullAt(base + j)) {
          if (!first) { bytes(off) = ' '; off += 1 }
          val s = tk.getUTF8String(base + j)
          s.writeToMemory(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
          off += s.numBytes()
          first = false
        }
        j += 1
      }
      out(i) = UTF8String.fromBytes(bytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[AffineMinMod]] kernel: min over non-null elements of
    * (a*h + b) % mod — Java remainder (the sign rule of Spark's `%`),
    * wrapping long arithmetic (the house posture; the affine image of a
    * 32-bit hash never nears the boundary). NULL when no non-null element
    * exists (array_min semantics). */
  def minAffine(hs: ArrayData, a: Long, b: Long, mod: Long): Any = {
    val m = hs.numElements()
    var best = Long.MaxValue
    var any = false
    var i = 0
    while (i < m) {
      if (!hs.isNullAt(i)) {
        val v = (a * hs.getLong(i) + b) % mod
        if (!any || v < best) { best = v; any = true }
      }
      i += 1
    }
    if (!any) null else java.lang.Long.valueOf(best)
  }
}

/** graft_shingle_hashes(tk ARRAY<STRING>, n) → ARRAY<BIGINT>: exactly
  * `transform(array_distinct(filter(shingles(tk, n), x -> x != '')), h32)`
  * for token arrays with size(tk) >= n (the contract every caller
  * guarantees; shorter arrays yield an empty result instead of the
  * composed form's ANSI index error). `n` must be a positive INT literal. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes expects ARRAY<STRING> and n >= 1, got $t, n=$n")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleOps.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def apply(tk: Column, n: Int): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(tk), n))
}

/** graft_tokens(s STRING) → ARRAY<STRING>: exactly
  * `filter(split(s, ' '), x -> x != '')` — the corpus tokenizer — as one
  * byte scan (the composed form is a regex split building empty segments
  * plus an interpreted ArrayFilter pass over them). */
case class Tokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_tokens expects STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override def nullSafeEval(input: Any): Any =
    ShingleOps.computeTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.computeTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): Tokens =
    copy(child = newChild)
}

object Tokens {
  def apply(c: Column): Column = GraftBridge.column(Tokens(GraftBridge.expression(c)))
}

/** graft_shingle_array(tk ARRAY<STRING>, n, stride) → ARRAY<STRING>:
  * stride 1 is exactly [[TextOps.shingles]] (duplicates and empty shingles
  * preserved — the positional q80/q63/q64 gram streams); stride n is the
  * q71 fixed-chunk split. For size(tk) >= n, as one fused byte-level
  * loop. */
case class ShingleArray(child: Expression, n: Int, stride: Int = 1)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 && stride >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_array expects ARRAY<STRING>, n >= 1, stride >= 1, got $t, n=$n, stride=$stride")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_array"

  override def nullSafeEval(input: Any): Any =
    ShingleOps.computeStrings(input.asInstanceOf[ArrayData], n, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.computeStrings($c, $n, $stride)")

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {
  def apply(tk: Column, n: Int): Column =
    GraftBridge.column(ShingleArray(GraftBridge.expression(tk), n))
  def apply(tk: Column, n: Int, stride: Int): Column =
    GraftBridge.column(ShingleArray(GraftBridge.expression(tk), n, stride))
}

/** graft_affine_min_mod(hs ARRAY<BIGINT>, a, b, mod) → BIGINT: exactly
  * `array_min(transform(hs, h -> (a*h + b) % mod))` (skip-null min, NULL
  * for empty/all-null), computed in one fused loop. a/b/mod are LONG
  * literals fixed at plan time. */
case class AffineMinMod(child: Expression, a: Long, b: Long, mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if mod != 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_affine_min_mod expects ARRAY<BIGINT> and mod != 0, got $t, mod=$mod")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_affine_min_mod"

  override def nullSafeEval(input: Any): Any =
    ShingleOps.minAffine(input.asInstanceOf[ArrayData], a, b, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("v")
      s"""
         |Object $v = graft.functions.ShingleOps.minAffine($c, ${a}L, ${b}L, ${mod}L);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $v).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AffineMinMod =
    copy(child = newChild)
}

object AffineMinMod {
  def apply(hs: Column, a: Long, b: Long, mod: Long): Column =
    GraftBridge.column(AffineMinMod(GraftBridge.expression(hs), a, b, mod))
}
