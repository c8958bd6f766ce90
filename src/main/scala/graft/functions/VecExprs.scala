package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two double arrays as a NATIVE codegen'd expression.
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0.0, _+_)`: Catalyst
  * higher-order functions execute their lambdas interpreted (~3 µs per
  * call — measured in round 1, see Dedup.withSignatures), so a 64-dim dot
  * product pays ~200 µs/row and an ANN scan over N embeddings is
  * lambda-bound. This expression compiles to a tight primitive loop
  * inside whole-stage codegen — the "custom Expression beats UDF beats
  * interpreted HOF" rung of the extension ladder.
  *
  * Semantics: sum over ascending index of a(i)*b(i), exactly the left-fold
  * order of the HOF formulation and of the DuckDB oracle's
  * list_sum(list_transform(...)) — bit-identical IEEE doubles. Arrays are
  * expected element-non-null (embedding vectors); shorter array bounds the
  * loop.
  */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  // explicit check instead of ImplicitCastInputTypes (AbstractDataType is
  // private[sql]); the graft_dot registration inserts the array<double>
  // casts so SQL callers still get float-array coercion
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires (array<double>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
