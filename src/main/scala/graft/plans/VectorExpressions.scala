package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** SURVEY.md §2.H — native Catalyst expressions for the vector hot path.
  *
  * The library's public API builds dot products declaratively
  * (aggregate ∘ zip_with, VectorFunctions.dot); these fused kernels compute
  * the identical sequential double fold in one tight loop with full
  * whole-stage codegen — no lambda allocation per element, no intermediate
  * array. The optimizer rule in GraftExtensions swaps them in, so results
  * are bit-identical with or without the extension.
  *
  * Element types: each side may be array<float> or array<double>
  * (embeddings are float; IVF centroids from avg() are double) — each
  * element is widened to double exactly as the HOF lambda's cast does.
  */
trait VectorBinaryExpression extends BinaryExpression {
  override def nullIntolerant: Boolean = true

  /** Mismatched-length inputs yield NULL — exactly what the declarative
    * aggregate∘zip_with shape does (zip_with null-pads the shorter array,
    * the multiply nulls out, the sum goes null), so FuseDotProduct's
    * bit-identical claim holds on ragged/malformed vectors too. */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (lt, rt) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<float|double>, array<float|double>), got ($lt, $rt)")
    }

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def getElem(e: Expression, arr: ArrayData, i: Int): Double =
    elemType(e) match {
      case FloatType => arr.getFloat(i).toDouble
      case _         => arr.getDouble(i)
    }

  protected def getElemCode(e: Expression, arr: String, i: String): String =
    elemType(e) match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }
}

case class DotProduct(left: Expression, right: Expression)
  extends VectorBinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += getElem(left, x, i) * getElem(right, y, i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ${getElemCode(left, a, i)} * ${getElemCode(right, b, i)};
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Full cosine similarity in one pass (dot and both norms in a single
  * loop) — the SQL-function form (`graft_cosine`) for end users. Division
  * and sqrt ordering matches dot/(sqrt(na)*sqrt(nb)) exactly. */
case class CosineSimilarity(left: Expression, right: Expression)
  extends VectorBinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = getElem(left, x, i)
      val yv = getElem(right, y, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    // zero-norm vector: no direction, cosine undefined → NULL, matching
    // the declarative dot/nullif(na*nb, 0) form (raw 0.0/0.0 would be NaN)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = ${getElemCode(left, a, i)};
         |    double $yv = ${getElemCode(right, b, i)};
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  double ${dot}_den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if (${dot}_den == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / ${dot}_den;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance in one codegen'd loop — the fused form of the
  * declarative aggregate∘zip_with (x−y)·(x−y) shape (Ann.l2sq), the PQ
  * assignment hot path (r19, guide §4: the interpreted HOF allocates a
  * zipped array + two lambda frames per element, per candidate code).
  * Fold order is identical (element 0 first, acc + v), so the rewrite is
  * bit-exact — but ONLY on array<double> inputs, where the HOF lambda
  * subtracts in double too; FuseL2Squared guards on the element type
  * (a float-array lambda would subtract in FLOAT before widening). */
case class L2Squared(left: Expression, right: Expression)
  extends VectorBinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var d = 0.0
    var i = 0
    while (i < n) {
      val diff = getElem(left, x, i) - getElem(right, y, i)
      d += diff * diff
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $diff = ${getElemCode(left, a, i)} - ${getElemCode(right, b, i)};
         |    $d += $diff * $diff;
         |  }
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Squared =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product over two array<long> columns in one codegen'd
  * loop — the fused form of the int8 tier's aggregate∘zip_with long dot
  * (Ann.ivfInt8TopK). Uses multiplyExact/addExact so an overflow throws
  * exactly as the ANSI Multiply/Add fold it replaces would (the int8
  * codes are |x| ≤ 127, so neither path can actually overflow). */
case class LongDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (lt, rt) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<bigint>, array<bigint>), got ($lt, $rt)")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = Math.addExact(acc, Math.multiplyExact(x.getLong(i), y.getLong(i)))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc = java.lang.Math.addExact($acc,
         |      java.lang.Math.multiplyExact($a.getLong($i), $b.getLong($i)));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}
