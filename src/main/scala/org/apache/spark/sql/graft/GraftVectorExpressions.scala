package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding dot product.
  *
  * Lives under `org.apache.spark.sql` because the pieces an expression
  * library needs — `AbstractDataType` (for `ExpectsInputTypes`) and the
  * `Column` ⇄ `Expression` bridge (`classic.ExpressionUtils`) — are
  * `private[sql]`; this is the standard packaging pattern for Spark-native
  * expression extensions. The graft-facing API is
  * `graft.functions.VectorExpressions`.
  *
  * Why a custom expression: the similarity operators evaluate ⟨a,b⟩ once
  * per candidate pair in their hot loop. The built-in route —
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is a higher-order function:
  * it allocates an intermediate array per row and evaluates interpreted
  * (HOFs get no whole-stage codegen). This expression generates a tight
  * primitive loop inside whole-stage codegen — no allocation, no lambda
  * dispatch — and keeps the exact same left-to-right summation order, so
  * results stay bit-identical to the HOF form and to DuckDB's
  * `list_dot_product` oracle.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // Null contract matches the HOF reference form exactly: a dimension
  // mismatch (zip_with pads with null → null product) or a null element
  // yields NULL, never a silent partial sum over the shorter prefix.
  // So the result can be null even when both inputs are non-null:
  override def nullable: Boolean = true

  /** True when either child's array type admits null elements; when both
    * are containsNull=false the per-element null checks compile away. */
  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _                => true
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (elementsNullable && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val elemNullCheck =
        if (elementsNullable)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemNullCheck
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object GraftVectorExpressions {
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  val dotProductDescription:
      (org.apache.spark.sql.catalyst.FunctionIdentifier,
       org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
       Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[DotProduct].getName, "dot_product"),
    (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  /** Register `dot_product` on an EXISTING session's function registry so
    * `spark.sql("... dot_product(a, b) ...")` resolves — the
    * already-running-session counterpart of `GraftExtensions`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = dotProductDescription
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
