package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cosine similarity between two float-vector columns as a native Catalyst
  * expression with whole-stage codegen — single fused loop over both arrays,
  * no intermediate zip array allocation (vs composing zip_with + aggregate),
  * no UDF serialization boundary. This is the hot inner op of the similarity
  * and near-dup queries, executed O(n_pairs) times at 100 TB scale.
  *
  * Numeric contract (kept bit-identical with the DuckDB oracle SQL): each
  * product is computed in float32 then widened to double and accumulated in
  * index order; result = dot / (sqrt(norm_a) * sqrt(norm_b)). NULL on NULL
  * input, mismatched lengths, or zero norm.
  */
case class FloatCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i); val y = b.getFloat(i)
      dot += (x * y).toDouble
      na += (x * x).toDouble
      nb += (y * y).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        final int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            final float $x = $a.getFloat($i);
            final float $y = $b.getFloat($i);
            $dot += (double) ($x * $y);
            $na += (double) ($x * $x);
            $nb += (double) ($y * $y);
          }
          if ($na == 0.0 || $nb == 0.0) {
            ${ev.isNull} = true;
          } else {
            ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatCosine =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-API entry point: cosine similarity of two array<float> columns. */
  def floatCosine(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(FloatCosine(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))
}
