package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Gradient-boosted-ensemble margins as a native Catalyst expression.
  *
  * Why custom (builder preference order (b)): the 500-tree reference
  * artifact (reference model.json:1) compiled to nested CaseWhen
  * expressions blows the JVM's 64 KB method limit — janino fails and
  * whole-stage codegen falls back to INTERPRETED eval over a 2500-node
  * expression tree per margin. The scalable form is the one every
  * columnar scorer uses: the ensemble as flat arrays (structure of
  * arrays, cache-friendly), a per-row walk that is O(depth) per tree,
  * and ~one line of generated code — a static-shaped call into compiled
  * Scala via a reference object — so the scoring projection stays
  * inside whole-stage codegen no matter how many trees the artifact
  * carries. Model size is fixed (~tens of KB), shipped once per
  * executor in the task closure, never per row.
  */
final class XgbEnsemble(
    val numClass: Int,
    val base: Double,
    val treeCls: Array[Int],   // class of tree t
    val offset: Array[Int],    // root node index of tree t in the flat arrays
    val left: Array[Int],      // left child (global index), -1 = leaf
    val right: Array[Int],     // right child (global index)
    val featIdx: Array[Int],   // feature ordinal of split node
    val cond: Array[Double],   // split threshold, or LEAF VALUE at leaves
    val defLeft: Array[Boolean]) // default child for MISSING at split node
    extends Serializable {

  /** Margins per class: base_score + per-class tree sums, accumulated
    * in GLOBAL tree order — for round-robin tree_info this is exactly
    * the artifact order per class, so the float64 additions happen in
    * the same sequence as the oracle's left-to-right SQL sum and the
    * margins are bit-exact across engines. `feature < threshold → left`
    * is the xgboost split rule; a MISSING feature (encoded NaN, the
    * xgboost convention — the caller coalesces SQL NULL to NaN) routes
    * to the node's `default_left` child, exactly the artifact's learned
    * missing direction. A bare `NaN < cond` would silently route every
    * missing value right — the r10 null-jitter gate caught that class. */
  def score(x0: Double, x1: Double): Array[Double] = {
    val m = new Array[Double](numClass)
    java.util.Arrays.fill(m, base)
    var t = 0
    while (t < treeCls.length) {
      var i = offset(t)
      while (left(i) >= 0) {
        val f = if (featIdx(i) == 0) x0 else x1
        i = if (java.lang.Double.isNaN(f)) (if (defLeft(i)) left(i) else right(i))
            else if (f < cond(i)) left(i) else right(i)
      }
      m(treeCls(t)) += cond(i)
      t += 1
    }
    m
  }
}

/** `xgb_margins(x0, x1)` → array<double> of class margins. Inputs are
  * the two feature columns cast to double by the caller (matching the
  * oracle's BIGINT < DOUBLE promotion). */
case class XgbScore(left: Expression, right: Expression, model: XgbEnsemble)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "xgb_margins"

  protected override def nullSafeEval(x0: Any, x1: Any): Any =
    new GenericArrayData(model.score(x0.asInstanceOf[Double], x1.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("xgbModel", model, classOf[XgbEnsemble].getName)
    defineCodeGen(ctx, ev, (x0, x1) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData($ref.score($x0, $x1))")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): XgbScore =
    copy(left = newLeft, right = newRight)
}

object XgbScore {
  /** Column-level entry point (Spark 4.x Column↔Expression bridge). */
  def xgbMargins(x0: Column, x1: Column, model: XgbEnsemble): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.toColumn(XgbScore(ColumnBridge.toExpr(x0), ColumnBridge.toExpr(x1), model))
  }
}
