package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, Cast, Expression, LessThan, LessThanOrEqual, Literal,
  RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule (`spark.graft.topkRewrite=true`): rewrite the
  * `row_number().over(partitionBy K orderBy S)` + `filter(rn <= k)`
  * idiom so the WINDOW'S CHILD is pre-reduced by [[TopKPerKeyNode]].
  * The Window + Filter (and any Project between them) stay in place —
  * they now run over ≤ keys × k rows, so `rn` is still produced with
  * identical semantics — but the corpus-sized input goes through the
  * heap operator's partial/final path instead of each
  * WindowGroupLimit stage's full partition sort.
  *
  * Deliberately narrow (and OFF by default): exactly one row_number
  * window expression, a top-level `rn <= lit` / `rn < lit` filter on
  * it (directly or through one Project that may cast it), non-empty
  * partition spec. Anything else — rank/dense_rank (tie semantics
  * differ from a row-capped heap), rn inside a composite predicate,
  * empty partitioning — is left to Spark's own SPARK-37099 inference.
  * Results are EXACTLY preserved when the window order is total per
  * key (`row_number`'s own determinism contract); TopKRewriteSpec pins
  * equality against the un-rewritten plan.
  */
case class TopKRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.topkRewrite").contains("true")

  private def intOf(e: Expression): Option[Int] = e match {
    case Literal(v: Int, _) => Some(v)
    case Literal(v: Long, _) if v.isValidInt => Some(v.toInt)
    case _ => None
  }

  /** Does attribute `a` carry the row_number value `rn` through
    * `projList` (identically or under a cast)? */
  private def carriesRn(
      a: Attribute, rnAttr: Attribute,
      projList: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression]): Boolean =
    projList.exists {
      case out: Attribute => out.semanticEquals(a) && out.semanticEquals(rnAttr)
      case out: Alias if out.toAttribute.semanticEquals(a) => out.child match {
        case c: Cast => c.child.semanticEquals(rnAttr)
        case e => e.semanticEquals(rnAttr)
      }
      case _ => false
    }

  private def limitOf(
      cond: Expression, rnAttr: Attribute,
      projList: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression]): Option[Int] = {
    def isRn(e: Expression): Boolean = e match {
      case a: Attribute => carriesRn(a, rnAttr, projList)
      case Cast(a: Attribute, _, _, _) => carriesRn(a, rnAttr, projList)
      case _ => false
    }
    cond match {
      case LessThanOrEqual(l, r) if isRn(l) => intOf(r)
      case LessThan(l, r) if isRn(l) => intOf(r).map(_ - 1)
      case _ => None
    }
  }

  private def rewrite(
      f: Filter, cond: Expression, w: Window, rnAlias: Alias,
      projList: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression],
      wrap: LogicalPlan => LogicalPlan): LogicalPlan =
    limitOf(cond, rnAlias.toAttribute, projList) match {
      case Some(k) if k > 0 && w.partitionSpec.nonEmpty &&
          !w.child.isInstanceOf[TopKPerKeyNode] =>
        val reduced = TopKPerKeyNode(w.partitionSpec, w.orderSpec, k, w.child)
        f.copy(child = wrap(w.copy(child = reduced)))
      case _ => f
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      // Filter directly over the Window
      case f @ Filter(cond,
          w @ Window(Seq(al @ Alias(WindowExpression(_: RowNumber, _), _)), _, _, _, _)) =>
        rewrite(f, cond, w, al, w.output.map(a => a), identity)
      // Filter over a Project (e.g. the cast-to-long alias) over the Window
      case f @ Filter(cond, p @ Project(projList,
          w @ Window(Seq(al @ Alias(WindowExpression(_: RowNumber, _), _)), _, _, _, _))) =>
        rewrite(f, cond, w, al, projList, rewritten => p.copy(child = rewritten))
    }
}

object TopKRewrite {
  /** Hook for [[graft.functions.GraftExtensions]]. */
  def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(TopKRewrite(_))
}
