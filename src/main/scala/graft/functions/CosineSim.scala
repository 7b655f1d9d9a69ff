package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd cosine similarity over two `array<double>` columns.
  *
  * The composed `zip_with`+`aggregate` form (VectorOps.cosine) builds
  * three interpreted higher-order folds per row; in the ANN/dedup hot
  * paths that is the per-row cost. This expression emits one fused
  * while-loop inside whole-stage codegen: dot, ‖a‖² and ‖b‖² in a
  * single pass. The accumulation order (ascending index) matches the
  * sequential HOF fold exactly, so results are bit-identical and the
  * DuckDB differential oracles are unaffected.
  *
  * (The reference has no vector ops; this is part of the
  * training-pipeline superset. Custom-Expression route per the
  * build rules: native `Expression` with `doGenCode` over a UDF.)
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are always array<double> (built by VectorOps.toDoubleVec);
  // no ExpectsInputTypes — AbstractDataType is private[sql]
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  // NULL contract matches VectorOps.cosine exactly: zip_with pads
  // unequal lengths with nulls and the aggregate fold absorbs any
  // null element, so both cases yield NULL there — and must here.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot /
         |      (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
