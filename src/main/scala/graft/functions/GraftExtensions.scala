package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** cos(x, x) strength-reduced: 1.0 unless the vector is NULL or zero-norm —
  * one pass over one array instead of three accumulators over two. Produced
  * by [[CosineSelfRule]], never written by hand. */
case class SelfCosine(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "self_cosine"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var i = 0
    while (i < a.numElements()) {
      if (a.getFloat(i) != 0.0f) return java.lang.Double.valueOf(1.0)
      i += 1
    }
    null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val nz = ctx.freshName("nonzero")
      s"""
        boolean $nz = false;
        for (int $i = 0; $i < $a.numElements() && !$nz; $i++) {
          if ($a.getFloat($i) != 0.0f) $nz = true;
        }
        if ($nz) { ${ev.value} = 1.0; } else { ${ev.isNull} = true; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SelfCosine =
    copy(child = newChild)
}

/** Optimizer rule: FloatCosine(x, x) == 1.0 for any non-null, non-zero-norm
  * x — rewrite to the cheaper single-array [[SelfCosine]] when both sides are
  * semantically the same deterministic expression. */
object CosineSelfRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case FloatCosine(l, r) if l.deterministic && l.semanticEquals(r) =>
        SelfCosine(l)
    }
}

/** Session extensions: SQL-registered float_cosine + the self-cosine
  * optimization. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("float_cosine"),
      new ExpressionInfo(classOf[FloatCosine].getName, "float_cosine"),
      (children: Seq[Expression]) => FloatCosine(children(0), children(1))))
    e.injectOptimizerRule(_ => CosineSelfRule)
  }
}
