package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd integer dot product over two `array<long>` columns —
  * the hot-path form of `VectorOps.dotLong`.
  *
  * Micro-unit quantized embeddings ([[VectorOps.microVec]]) make every
  * dot/norm an exact long, which is what keeps the ANN family's rank
  * keys bit-identical to the DuckDB oracles. The composed
  * `zip_with`+`aggregate` fold pays an interpreted lambda call and an
  * intermediate 64-element array per pair; at n·n/25 candidate pairs
  * that interpreter overhead IS the query time. This expression is the
  * same fused while-loop [[CosineSim]] uses, over longs: one pass, no
  * allocation, inside whole-stage codegen. Long addition is
  * associative, so the result is identical to the sequential fold —
  * oracles unaffected.
  *
  * (Training-pipeline superset; custom-Expression route per the build
  * rules: native `Expression` with `doGenCode` over a UDF.)
  */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"

  // NULL contract matches VectorOps.dotLong: length mismatch or any
  // null element yields NULL (zip_with pads + fold absorbs null).
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getLong(i) * y.getLong(i)
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $dot += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}
