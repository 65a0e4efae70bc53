package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector-similarity hot path
  * (SURVEY §2.11 notes no custom Expression is REQUIRED for reference
  * parity; these exist for the extension tier's scale path, where the
  * built-in composition `aggregate(zip_with(a, b, (x,y) -> x*y), ...)`
  * materializes an intermediate array and evaluates a lambda per element
  * per row — measurable overhead at billions of vectors).
  *
  * Both expressions generate a fused primitive loop inside whole-stage
  * codegen (`doGenCode`), summing in ascending index order — the same
  * order as the built-in fold and DuckDB's `list_sum`, so results stay
  * bit-identical to the oracle (asserted by VectorExprSpec).
  *
  * Registered SQL names: `graft_dot(a, b)`, `graft_norm2(a)`.
  */
object VectorExpressions {

  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    // inputs come from the library's own typed plans (array<double>);
    // ExpectsInputTypes is package-private-typed in Spark 4, so no
    // analyzer-level coercion — callers cast explicitly
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $x.getDouble($i) * $y.getDouble($i);
           |}
           |${ev.value} = $s;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  case class L2NormSq(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_norm2"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val v = ctx.freshName("v")
        s"""
           |int $n = $x.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $v = $x.getDouble($i);
           |  $s += $v * $v;
           |}
           |${ev.value} = $s;
           |""".stripMargin
      })

    override protected def withNewChildInternal(nc: Expression): Expression =
      copy(child = nc)
  }

  /** Idempotent session registration; afterwards `expr("graft_dot(a,b)")`
    * and `expr("graft_norm2(a)")` resolve in any DataFrame/SQL plan.
    * Guarded on a registry lookup so per-query callers don't re-register
    * (`createOrReplaceTempFunction` logs a replacement warning per call). */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("graft_dot"))) {
      reg.createOrReplaceTempFunction(
        "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction(
        "graft_norm2", exprs => L2NormSq(exprs.head), "built-in")
    }
  }
}
