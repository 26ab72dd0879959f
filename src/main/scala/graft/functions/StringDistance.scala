package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler kernel shared by interpreted eval and generated code.
  *
  * The arithmetic mirrors the textbook Winkler formulation exactly as the
  * common native implementations (RapidFuzz and its DuckDB vendoring)
  * evaluate it, operation for operation:
  * `((m/l1 + m/l2 + (m-t)/m) / 3`, then `sim + prefix*0.1*(1-sim)` above the
  * 0.7 boost threshold — every step a correctly-rounded IEEE double op in
  * the same order, so results are BIT-IDENTICAL to those engines (verified
  * empirically against the DuckDB oracle over every distinct-name pair in
  * the corpus). Matching runs over UTF-8 BYTES, also like those engines —
  * identical on ASCII, byte-wise (not codepoint-wise) beyond it. */
object JaroWinklerImpl {
  /** Winkler boost threshold and prefix cap (the standard constants). */
  val BoostThreshold = 0.7
  val MaxPrefix = 4

  def similarity(u1: UTF8String, u2: UTF8String): Double = {
    val s1 = u1.getBytes
    val s2 = u2.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val c = s1(i)
      var j = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s2(j) == c) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    var sim = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (sim > BoostThreshold) {
      var prefix = 0
      val cap = math.min(MaxPrefix, math.min(l1, l2))
      while (prefix < cap && s1(prefix) == s2(prefix)) prefix += 1
      sim += prefix * 0.1 * (1.0 - sim)
    }
    sim
  }
}

/** `jaro_winkler(a, b)` as a native Catalyst expression: codegen emits one
  * static call into [[JaroWinklerImpl]], so the comparison stays inside the
  * whole-stage-codegen pipeline (no UDF serialization, no Row boxing) — the
  * preferred shape for a scalar kernel Spark lacks (builder prompt's
  * extension ladder, step b). */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerImpl.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object StringDistance {
  /** Column-API entry point for [[JaroWinkler]]. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(JaroWinkler(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))
}
