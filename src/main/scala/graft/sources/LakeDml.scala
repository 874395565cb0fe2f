package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{expr, lit}

/** SQL `UPDATE` over lake tables (r12) — the analyzer rule
  * [[graft.GraftExtensions]] injects (post-hoc resolution): an analyzed
  * `UpdateTable` whose target resolves to a lake table — the DSv2
  * catalog's [[LakeV2Table]] OR a session-catalog `USING graft-lake`
  * [[LakeRelation]] — rewrites into [[UpdateLakeDvCommand]], which runs
  * [[LakeTable.updateWhereDv]]: the merge-on-read UPDATE (one atomic
  * commit, sidecar hides matched rows, fresh files carry updated
  * copies, zero pre-existing files rewritten). Spark itself supports
  * UPDATE only through `SupportsRowLevelOperations` group rewrites
  * (copy-on-write); this rule is the extension-point spelling of the
  * merge-on-read path.
  *
  * Scope, enforced here so an unsupported UPDATE fails at ANALYSIS and
  * never half-applies: top-level column assignments only (no nested
  * fields), no subqueries in the condition or values (the rewrite
  * carries expressions by their generated SQL — scalar expressions over
  * the table's own columns round-trip exactly; a subquery would not).
  * Anything out of scope falls through untouched, so Spark's own
  * "UPDATE requires row-level operation support" error surfaces. */
class LakeUpdateRule(session: SparkSession) extends Rule[LogicalPlan] {
  private def lakeDirOf(table: LogicalPlan): Option[(String, String)] =
    table.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[LakeV2Table] =>
        val t = r.table.asInstanceOf[LakeV2Table]
        (t.dir, t.name())
      case l: LogicalRelation if l.relation.isInstanceOf[LakeRelation] =>
        val rel = l.relation.asInstanceOf[LakeRelation]
        (rel.tableDir, rel.tableDir)
    }

  private def noSubquery(e: Expression): Boolean =
    !e.containsPattern(
      org.apache.spark.sql.catalyst.trees.TreePattern.PLAN_EXPRESSION)

  /** `.sql` of the expression with attribute QUALIFIERS stripped — the
    * analyzed tree renders `cat.ns.tbl.col`, which cannot re-resolve
    * against the bare table frame the command reads. */
  private def bareSql(e: Expression): String =
    e.transform {
      case a: AttributeReference => a.withQualifier(Seq.empty)
    }.sql

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case u @ UpdateTable(table, assignments, condition) if u.resolved =>
        lakeDirOf(table) match {
          case Some((dir, ident))
              if assignments.forall {
                   case Assignment(_: Attribute, v) => noSubquery(v)
                   case _ => false
                 } && condition.forall(noSubquery) =>
            UpdateLakeDvCommand(dir, ident,
              condition.map(bareSql),
              assignments.map {
                case Assignment(a: Attribute, v) => a.name -> bareSql(v)
              })
          case _ => u // not a lake table / out of scope: Spark's error
        }
    }
}

/** The runnable half of [[LakeUpdateRule]]: re-parses the carried SQL
  * fragments against the table's own frame and commits through
  * [[LakeTable.updateWhereDv]] (serialized write-audit-publish;
  * row-conservation + schema-evolution gates). Empty match = no-op
  * success, Delta semantics. */
case class UpdateLakeDvCommand(dir: String, ident: String,
                               condSql: Option[String],
                               sets: Seq[(String, String)])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val pred = condSql.map(expr).getOrElse(lit(true))
    LakeTable.updateWhereDv(spark, dir, pred,
        sets.map { case (c, s) => c -> expr(s) })(_ => None) match {
      case Right(_) => Seq.empty
      case Left(reason) => throw new IllegalStateException(
        s"UPDATE $ident failed: $reason")
    }
  }
}
