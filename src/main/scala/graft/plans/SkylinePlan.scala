package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst integration for the skyline (SURVEY.md §2
  * preference (c): custom LogicalPlan + Strategy + SparkPlan) — the planner
  * path equivalent of [[graft.operators.Skyline]]. Registered at runtime via
  * `spark.experimental.extraStrategies` (no session rebuild needed); the
  * logical node keeps the child's output, so column pruning and pushdown
  * below the skyline still apply.
  */
case class SkylinePlan(child: LogicalPlan, dims: Seq[Attribute]) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): SkylinePlan =
    copy(child = newChild)
}

object SkylineStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SkylinePlan(child, dims) => SkylineExec(planLater(child), dims) :: Nil
    case _ => Nil
  }
}

/** Physical skyline: partition-local BNL prune, then a global BNL over the
  * (small) union of local skylines — same algorithm and complexity as the
  * DataFrame composition, expressed as a first-class physical operator.
  * Rows with NULL in any dimension are excluded (no dominance order).
  */
case class SkylineExec(child: SparkPlan, dims: Seq[Attribute]) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: SparkPlan): SkylineExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val ordinals = dims.map(d => child.output.indexWhere(_.exprId == d.exprId)).toArray
    require(ordinals.forall(_ >= 0), s"skyline dims ${dims.mkString(",")} not in child output")
    val dataTypes = ordinals.map(child.output(_).dataType)
    val orderings = dataTypes.map(TypeUtils.getInterpretedOrdering)

    def dominates(b: InternalRow, a: InternalRow): Boolean = {
      var strict = false
      var i = 0
      while (i < ordinals.length) {
        val c = orderings(i).compare(
          b.get(ordinals(i), dataTypes(i)), a.get(ordinals(i), dataTypes(i)))
        if (c > 0) return false
        if (c < 0) strict = true
        i += 1
      }
      strict
    }

    def bnl(it: Iterator[InternalRow]): Iterator[InternalRow] = {
      val window = scala.collection.mutable.ArrayBuffer[InternalRow]()
      it.foreach { r0 =>
        var hasNull = false
        var i = 0
        while (i < ordinals.length && !hasNull) {
          if (r0.isNullAt(ordinals(i))) hasNull = true
          i += 1
        }
        if (!hasNull) {
          val r = r0.copy()
          if (!window.exists(w => dominates(w, r))) {
            var j = 0
            while (j < window.length) {
              if (dominates(r, window(j))) window.remove(j) else j += 1
            }
            window += r
          }
        }
      }
      window.iterator
    }

    child.execute().mapPartitions(bnl).coalesce(1).mapPartitions(bnl)
  }
}

object SkylinePlan {
  /** Install the strategy (idempotent) and build a skyline DataFrame over
    * `df` with all `dims` minimized.
    */
  def skyline(df: org.apache.spark.sql.DataFrame, dims: Seq[String]): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(SkylineStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ SkylineStrategy
    val analyzed = df.queryExecution.analyzed
    val attrs = dims.map(d => analyzed.output.find(_.name == d).getOrElse(
      throw new IllegalArgumentException(s"no column $d")))
    org.apache.spark.sql.graftbridge.DatasetBridge.ofRows(
      spark, SkylinePlan(analyzed, attrs))
  }
}
