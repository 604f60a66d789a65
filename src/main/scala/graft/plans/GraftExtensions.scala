package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Session extension point: registers graft's native expressions for
  * SQL use and injects the graft SQL dialect into the session parser,
  * so plain `spark.sql("MERGE INTO v USING s ON ... WHEN ...")` (and
  * UPDATE / DELETE / OPTIMIZE / RESTORE / DESCRIBE HISTORY / VERSION
  * AS OF / table_changes — the whole [[graft.sql.GraftSql]] surface)
  * works on registered snapshot views without calling `GraftSql.dml`
  * directly. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(a, b) takes two array<float> arguments")
        CosineSim(args.head, args(1))
      }))
    e.injectParser((_, delegate) => new GraftParser(delegate))
  }
}

/** The dialect parser: statements the graft SQL surface OWNS — DML on
  * a REGISTERED snapshot view, DESCRIBE HISTORY/DETAIL of one, or the
  * time-travel / change-feed read dialect — are handled by
  * [[graft.sql.GraftSql]]; everything else delegates verbatim to the
  * stock parser, so the extension is invisible outside the dialect.
  *
  * DML executes AT PARSE TIME and returns a one-row `version` plan
  * (Delta's SQL DML shape) — for a mutation statement, parsing IS the
  * action, the same contract the stock parser gives DDL commands. The
  * registration check keys on the ACTIVE session, so two sessions with
  * different registrations never see each other's views.
  */
final class GraftParser(delegate: ParserInterface) extends ParserInterface {

  private def intercept(sqlText: String): Option[LogicalPlan] =
    SparkSession.getActiveSession
      .flatMap(s => graft.sql.GraftSql.interceptSql(s, sqlText))
      .map {
        case Right(plan) => plan
        case Left(rewritten) => delegate.parsePlan(rewritten)
      }

  override def parsePlan(sqlText: String): LogicalPlan =
    intercept(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(sqlText: String,
      parameters: ParameterContext): LogicalPlan =
    // the graft dialect takes no bind parameters; an owned statement
    // parses the same either way, everything else delegates with its
    // parameters intact
    intercept(sqlText)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, parameters))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)

  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)

  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
