package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Pushes filters through Window operators when every window in the
  * node partitions by a column the predicate is functionally tied to.
  *
  * The clinical pipeline (SURVEY.md §4) NEEDS its gender/age/clinic
  * filters applied after the metrics — but those predicates are
  * constant per user, and every window partitions by `UID`, so
  * filtering BEFORE the windows removes whole partitions and cannot
  * change any surviving row's metrics. Catalyst's stock
  * PushPredicateThroughNonJoin only pushes predicates over the window's
  * own partition keys; this rule generalizes to predicates over any
  * column as long as EVERY window spec in the node shares at least one
  * partition key with... no — the sound criterion implemented here:
  *
  *   a predicate may cross a Window node iff the set of columns it
  *   references is partition-determined: every referenced column is
  *   either (a) one of the window partition keys of ALL window
  *   expressions in the node, or (b) declared per-partition-constant
  *   via [[PartitionFunctionalDependencies]] — i.e. a function of those
  *   keys in the source data (Gender/Age/ClinicID are per-UID constant).
  *
  * Registered through SparkSessionExtensions
  * ([[GraftExtensions]]) or `spark.experimental.extraOptimizations`.
  */
object UserConstantPredicatePushdown extends Rule[LogicalPlan] {

  /** Columns declared constant within any partition of the named key —
    * domain knowledge the optimizer cannot infer from the plan. The
    * clinical schema's user attributes are constant per UID (one users
    * row per UID feeding a left join).
    */
  val perUserConstant: Set[String] =
    Set("Gender", "Age", "ClinicID", "Name", "LastName", "Unit",
      "Birthday", "Height", "UIDCreatedDate", "User_IsActive", "loginId", "success")
  val anchorKey = "UID"

  private def partitionKeysOf(w: Window): Seq[String] =
    w.partitionSpec.collect { case a: Attribute => a.name }

  private def pushable(cond: Expression, w: Window): Boolean = {
    val keys = partitionKeysOf(w).toSet
    cond.deterministic &&
      keys.contains(anchorKey) &&
      cond.references.nonEmpty &&
      cond.references.forall(a => keys.contains(a.name) || perUserConstant.contains(a.name)) &&
      // referenced columns must come from below the window, not be
      // window outputs
      cond.references.subsetOf(w.child.outputSet)
  }

  /** Is this predicate one of ours (user-constant attrs only)? Used for
    * the Project hop so the rule never moves unrelated filters around.
    */
  private def userConstantOnly(cond: Expression): Boolean =
    cond.deterministic && cond.references.nonEmpty &&
      cond.references.forall(a => perUserConstant.contains(a.name) || a.name == anchorKey)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window) =>
      val (push, keep) = splitConjunctivePredicates(cond).partition(pushable(_, w))
      if (push.isEmpty) f
      else {
        val pushed = w.copy(child = Filter(push.reduce(And), w.child))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }

    // carry our predicates through deterministic Projects so the push
    // cascades across the window stack (the stock filter-through-project
    // rule ran in an earlier batch and does not re-fire here)
    case f @ Filter(cond, p: Project)
        if p.projectList.forall(_.deterministic) && p.child.isInstanceOf[Window] =>
      val aliasMap = p.projectList.collect {
        case a: Alias => a.toAttribute.exprId -> a.child
      }.toMap
      def substitute(e: Expression): Expression = e.transformUp {
        case a: Attribute => aliasMap.getOrElse(a.exprId, a)
      }
      val (push0, keep) = splitConjunctivePredicates(cond).partition(userConstantOnly)
      val push = push0.map(substitute).filter(e =>
        userConstantOnly(e) && e.references.subsetOf(p.child.outputSet))
      if (push.isEmpty || push.size != push0.size) f
      else {
        val pushed = p.copy(child = Filter(push.reduce(And), p.child))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }

  private def splitConjunctivePredicates(condition: Expression): Seq[Expression] =
    condition match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => other :: Nil
    }
}

/** Session extension registering the graft optimizer rules:
  * {{{ SparkSession.builder().withExtensions(new GraftExtensions) }}}
  * or `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => UserConstantPredicatePushdown)
  }
}
