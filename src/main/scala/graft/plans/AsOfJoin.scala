package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeSeq, BindReferences, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, Partitioning, StatefulOpClusteredDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Native as-of (point-in-time) join — builder preference (c): a custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`, the operator tier for
  * semantics Spark's built-ins can't express as one operator (SURVEY
  * §2.4; the composed union-and-carry form lives in
  * [[graft.operators.Events.opAsofJoin]]).
  *
  * Semantics (standard ASOF, DuckDB/pandas `merge_asof` backward): each
  * left row joins the SINGLE right row with equal keys and the greatest
  * `rightTime <= leftTime` (within `toleranceUs` if set); left rows with
  * no such match keep null right columns (left-outer). NULL keys and
  * NULL times never match, per SQL join semantics.
  *
  * Scale shape: both sides hash-cluster on the join keys and sort
  * in-partition by (keys, time) — declared via
  * `requiredChildDistribution` / `requiredChildOrdering`, so Catalyst
  * plans exactly two exchanges + two sorts and can elide any the data
  * already satisfies. The merge itself is a single forward pass per
  * partition holding ONE buffered right row — O(|L|+|R|) time, O(1)
  * memory — where the composed window form must union both relations,
  * sort the union, and carry every right payload column through a
  * running-window state. At 100 TB both shuffle the same bytes; the
  * native exec then streams instead of windowing, and composes with AQE
  * (the exchanges it requests are ordinary shuffles).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long],
    direction: String = "backward",
    allowExact: Boolean = true) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  private def timeOk(e: Expression): Boolean =
    e.dataType == TimestampType || e.dataType == LongType

  override lazy val resolved: Boolean =
    childrenResolved &&
      (leftKeys ++ rightKeys :+ leftTime :+ rightTime).forall(_.resolved) &&
      leftKeys.length == rightKeys.length && leftKeys.nonEmpty &&
      leftKeys.zip(rightKeys).forall { case (l, r) => l.dataType == r.dataType } &&
      timeOk(leftTime) && timeOk(rightTime) && leftTime.dataType == rightTime.dataType &&
      AsOfJoin.Directions.contains(direction) &&
      (allowExact || direction != "nearest")

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. Injected by
  * [[GraftExtensions]] (`injectPlannerStrategy`) and, for caller-owned
  * sessions, registered idempotently through
  * `spark.experimental.extraStrategies` by [[AsOfJoin.join]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(j.leftKeys, j.rightKeys, j.leftTime, j.rightTime, j.toleranceUs,
        j.direction, j.allowExact, planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: co-partitioned, co-sorted streamed merge.
  *
  * `requiredChildDistribution` asks for hash clustering on the join
  * keys on both sides; `requiredChildOrdering` for an in-partition sort
  * by (keys, time). EnsureRequirements inserts the exchanges/sorts only
  * when the children don't already satisfy them, and AQE may coalesce
  * the two shuffles — coherently, as it does for sort-merge join, since
  * both reads feed one stage. `doExecute` zips the co-partitioned RDDs
  * and merges each partition pair in one forward pass, buffering only
  * the latest in-window right row (the as-of candidate) at a time.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long],
    direction: String,
    allowExact: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Exact-hash requirement, NOT `ClusteredDistribution`: `doExecute`
    * pairs child partitions positionally via `zipPartitions`, which is
    * only sound when partition i on both sides covers the same key space.
    * `ClusteredDistribution` is the weakest clustering contract — a child
    * already hash-partitioned on a key SUBSET (or with a different
    * partition count) satisfies it, and the zip would then silently pair
    * rows from different key spaces. `StatefulOpClusteredDistribution` is
    * Spark's contract for exactly this shape (its zip-style stateful
    * joins): it is satisfied only by `HashPartitioning` over the FULL key
    * list, in order, with the exact partition count — same scheme both
    * sides — so any other incoming layout forces a correct re-exchange. */
  override def requiredChildDistribution: Seq[Distribution] =
    StatefulOpClusteredDistribution(leftKeys, conf.numShufflePartitions) ::
      StatefulOpClusteredDistribution(rightKeys, conf.numShufflePartitions) :: Nil

  private def ordering(keys: Seq[Expression], time: Expression): Seq[SortOrder] =
    keys.map(SortOrder(_, Ascending)) :+ SortOrder(time, Ascending)

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(ordering(leftKeys, leftTime), ordering(rightKeys, rightTime))

  // The merge streams left rows through unchanged, so the left child's
  // partitioning and (keys, time) sort order survive to the output —
  // declaring them lets a downstream per-key operator skip its own
  // exchange/sort.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = ordering(leftKeys, leftTime)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val tol = toleranceUs
    val dir = direction
    val exact = allowExact
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeEval = BindReferences.bindReference(lTimeExpr, AttributeSeq(lOut))
      val rTimeEval = BindReferences.bindReference(rTimeExpr, AttributeSeq(rOut))
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // Who owns an exact-time (rt == lt) row decides where it is held.
      // allowExact=true: forward keeps it at the cursor (it IS the
      // forward candidate); backward/nearest consume it as the backward
      // candidate (distance 0, so nearest's backward-on-tie picks it).
      // allowExact=false (strict): forward consumes it (it can only be a
      // BACKWARD candidate, and only for later lefts); backward leaves
      // it at the cursor un-consumed (invalid now, but a later left with
      // a greater time will consume it then) — both stay O(1).
      // nearest+strict is refused at plan level: it would need the
      // current left's forward candidate from BEHIND an unbounded run of
      // equal-time rows.
      val consumeExact = if (dir != "forward") exact else !exact

      new Iterator[InternalRow] {
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var candRow: InternalRow = null
        private var candKey: UnsafeRow = null
        private var candTime: Long = 0L

        private def advance(): Unit =
          rHead = if (rIter.hasNext) rIter.next() else null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lt = lTimeEval.eval(l)
          if (lk.anyNull || lt == null) {
            resultProj(joined(l, nullRight))
          } else {
            val ltime = lt.asInstanceOf[Long]
            var done = false
            while (!done && rHead != null) {
              val rk = rKeyProj(rHead)
              val cmp = keyOrd.compare(rk, lk)
              if (cmp < 0) {
                // Keys ascend on both sides: this right key can never
                // match the current or any later left row — discard.
                advance()
              } else if (cmp == 0) {
                val rt = rTimeEval.eval(rHead)
                if (rt == null) { // NULL time never matches; nulls sort first
                  advance()
                } else if (rt.asInstanceOf[Long] < ltime ||
                    (consumeExact && rt.asInstanceOf[Long] == ltime)) {
                  // left times ascend, so a row below the current left
                  // time can never be a FORWARD candidate for any later
                  // left row either — it is consumed as the running
                  // backward candidate and the cursor moves on
                  candRow = rHead.copy()
                  candKey = rk.copy()
                  candTime = rt.asInstanceOf[Long]
                  advance()
                } else done = true
              } else done = true
            }
            // backward candidate: greatest rightTime <= leftTime, buffered
            // (strictly below it under strict matching — exact-time rows
            // are only ever consumed by lefts with a GREATER time then)
            val backOk = candKey != null && keyOrd.compare(candKey, lk) == 0 &&
              (exact || candTime < ltime) && tol.forall(t => ltime - candTime <= t)
            // forward candidate: the cursor row itself, if it shares the
            // key (first rightTime >= leftTime by the sort — NOT consumed,
            // it may serve later left rows of this key too). Under strict
            // matching the cursor may hold an exact-time row in backward
            // mode; the strict bound below rejects it as a candidate.
            var fwdTime = 0L
            val fwdOk = dir != "backward" && rHead != null && {
              val rk = rKeyProj(rHead)
              keyOrd.compare(rk, lk) == 0 && {
                val rt = rTimeEval.eval(rHead)
                rt != null && {
                  fwdTime = rt.asInstanceOf[Long]
                  (exact || fwdTime > ltime) && tol.forall(t => fwdTime - ltime <= t)
                }
              }
            }
            val out = dir match {
              case "forward" => if (fwdOk) joined(l, rHead) else joined(l, nullRight)
              case "nearest" => // tie → backward (the earlier row)
                if (backOk && (!fwdOk || ltime - candTime <= fwdTime - ltime))
                  joined(l, candRow)
                else if (fwdOk) joined(l, rHead)
                else joined(l, nullRight)
              case _ => if (backOk) joined(l, candRow) else joined(l, nullRight)
            }
            resultProj(out)
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point for the native as-of join. */
object AsOfJoin {

  /** The pandas-`merge_asof` direction set: `backward` = greatest
    * rightTime <= leftTime (the default, SQL ASOF); `forward` = smallest
    * rightTime >= leftTime; `nearest` = the closer of the two, ties to
    * the BACKWARD (earlier) row. All three run in the same single-pass
    * streamed merge with O(1) state — the forward candidate is simply
    * the unconsumed cursor row. */
  val Directions: Set[String] = Set("backward", "forward", "nearest")

  /** `left ASOF LEFT JOIN right ON keys AND rightTime <= leftTime`
    * (most recent match; optionally within `toleranceUs` microseconds;
    * `direction` per [[Directions]]).
    * Output columns are `left.*` then `right.*` (right side nullable) —
    * give the right side disjoint column names. When the two plans
    * share attribute ids (self-derived sides), the right side is
    * re-aliased so the join's output attributes stay distinct.
    */
  def join(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftTime: String, rightTime: String,
           toleranceUs: Option[Long] = None,
           direction: String = "backward",
           allowExactMatches: Boolean = true): DataFrame = {
    require(Directions.contains(direction),
      s"asof direction must be one of ${Directions.mkString("/")}, got $direction")
    require(allowExactMatches || direction != "nearest",
      "asof nearest with allowExactMatches=false is unsupported: the forward " +
        "candidate would sit behind an unbounded run of equal-time rows, " +
        "breaking the O(1) merge state")
    val spark = left.sparkSession
    PlanBridge.ensureStrategy(spark, AsOfJoinStrategy)
    val lPlan = PlanBridge.analyzed(left)
    val rPlan0 = PlanBridge.analyzed(right)
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asof join: no column `$name` in [${plan.output.map(_.name).mkString(", ")}]"))
    PlanBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
      attr(lPlan, leftTime), attr(rPlan, rightTime), toleranceUs, direction,
      allowExactMatches))
  }
}
