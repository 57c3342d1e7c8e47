package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing kernel (SURVEY.md §2.H): the per-position window minima
  * of the rolling char-8-gram hash as ONE tight per-row loop, replacing the
  * relational form's char posexplode + two windows (which shuffles every
  * CHARACTER of the corpus on doc_id — ~40× the row volume — to sort
  * positions the string already has in order).
  *
  * Bit-identical contract: same codes (codepoint % 128), same base-128
  * pack, same LCG mix (mod 2^31−1), same trailing-8 minima as
  * TextAnalysis.winnowedRelational — asserted element-for-element by
  * WinnowPropertySpec, and the DuckDB oracle CTE replays the same math, so
  * every winnow oracle stays hash-green. Codegen emits a single static
  * call; the loop itself is compiled Scala (no per-element lambda, no
  * intermediate rows). */
case class WinnowFingerprints(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING child, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.WinnowFingerprints$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** Gram size / winnow window — MUST match winnowedRelational and the
    * DuckDB CTE (8/8 → containment guarantee at 15 shared chars). */
  final val K = 8
  final val W = 8
  private final val M = 2147483647L
  private final val A = 1103515245L
  private final val C = 12345L
  // 128^(K-1) .. 128^0 — the base-128 positional weights of the pack
  private final val Pow: Array[Long] =
    Array.iterate(1L, K)(_ * 128L).reverse

  /** One fingerprint per gram position: fp(i) = min of h(j) over the
    * trailing winnow window j ∈ [i−W+1, i] (partial at the head, exactly
    * like the relational rowsBetween(-(W-1), 0) frame). Empty array for
    * strings shorter than K chars. */
  def compute(u: UTF8String): ArrayData = {
    val s = u.toString
    // one code per Unicode CODEPOINT — split(text, "") splits UTF8String
    // into codepoint pieces and ascii() returns the piece's codepoint;
    // % 128 mirrors the relational pmod
    val cps = s.codePoints().toArray
    val n = cps.length
    val nG = n - K + 1
    if (nG <= 0) return new GenericArrayData(Array.empty[Long])
    val h = new Array[Long](nG)
    var i = 0
    while (i < nG) {
      var packed = 0L
      var k = 0
      while (k < K) { packed += (cps(i + k) % 128).toLong * Pow(k); k += 1 }
      h(i) = ((packed % M) * A + C) % M
      i += 1
    }
    val out = new Array[Long](nG)
    i = 0
    while (i < nG) {
      var m = h(i)
      var j = math.max(0, i - (W - 1))
      while (j < i) { if (h(j) < m) m = h(j); j += 1 }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }
}
