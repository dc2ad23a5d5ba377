package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dense dot product of two
  * `array<double>` columns — the hot kernel of every similarity /
  * ANN / LSH operator in [[graft.ext.Similarity]].
  *
  * Why a custom `Expression` (SURVEY §7.3 said "start with built-ins"):
  * the built-in formulation `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0d, (acc,v) -> acc+v)` is semantically identical but runs each
  * lambda through `HigherOrderFunction`'s interpreted closure path and
  * materializes the intermediate product array; profiling the minhash
  * pipeline showed interpreted lambdas ~5× slower than codegen'd
  * kernels of the same arithmetic. This expression emits a single
  * fused loop into whole-stage codegen (`doGenCode`) — no intermediate
  * array, no virtual calls per element — with an identical
  * interpreted fallback (`nullSafeEval`).
  *
  * Semantics (deliberately bit-compatible with the built-in
  * formulation AND DuckDB's `list_dot_product` over `DOUBLE[]`):
  * strictly sequential left-to-right summation over element index —
  * NOT reassociated, so results are reproducible double-for-double
  * across engines; length mismatch truncates to the shorter array
  * (`zip_with` pads with null, which the multiply would turn to null —
  * callers here always pass equal-length vectors); null array → null.
  * Array elements must be non-null (embedding vectors are); a null
  * element reads as 0.0 rather than poisoning the sum.
  *
  * Inputs must already be `array<double>` — the [[GraftFunctions]]
  * wrappers insert the (exact) `array<float>` → `array<double>` cast,
  * matching the oracle's `CAST(embedding AS DOUBLE[])`. (The implicit-
  * cast mixin would be nicer, but its `AbstractDataType` vocabulary is
  * `private[sql]`; an explicit type check keeps this file out of the
  * spark namespace.)
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}
