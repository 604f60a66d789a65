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
    e.injectResolutionRule(session => new GraftTableResolution(session))
  }
}

/** Analysis-time substitution for [[GraftCatalog]] tables: a
  * `DataSourceV2Relation` over a [[GraftTable]] becomes the
  * manifest-planned snapshot READ plan (file list from the manifest,
  * DV masks, eq-delete anti-joins, column mapping), aliased onto the
  * relation's output attributes so references above resolve
  * unchanged. This is how the full read semantics reach stock SQL
  * without reimplementing them as a DSv2 scan — and because the
  * substituted plan bottoms out in ordinary parquet relations,
  * Catalyst's pushdown/pruning/codegen all apply as if the user had
  * called `SnapshotLog.read` themselves. Unpinned tables read the
  * LATEST version at analysis time, so a catalog name never serves
  * the stale frame a repointed temp view could.
  *
  * Write commands are untouched: `AppendData`-family nodes hold their
  * target relation outside the operator tree (`table` is not a
  * child), so the transform only ever rewrites read sites.
  */
final class GraftTableResolution(session: SparkSession)
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, Cast}
  import org.apache.spark.sql.catalyst.plans.logical.Project
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // an InsertIntoStatement holds its TARGET as a child until
    // ResolveInsertInto converts it to an AppendData-family command —
    // substituting the target mid-flight would unresolve the insert,
    // so write-target relation INSTANCES are left alone (converted
    // commands hold the target outside the operator tree and are
    // never visited)
    val writeTargets =
      java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case i: org.apache.spark.sql.catalyst.plans.logical
        .InsertIntoStatement => writeTargets.add(i.table)
      case _ => ()
    }
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] &&
          !writeTargets.contains(r) =>
        val t = r.table.asInstanceOf[GraftTable]
        val read = graft.sources.snapshot.SnapshotLog
          .read(session, t.path, t.pinnedVersion).queryExecution.analyzed
        val aliased = r.output.map { o =>
          val n = read.output.find(_.name.equalsIgnoreCase(o.name))
            .getOrElse(throw new IllegalStateException(
              s"column '${o.name}' resolved against ${t.name()} is " +
                s"missing from the snapshot read of ${t.path} — the " +
                "table schema changed between load and analysis"))
          val e = if (n.dataType == o.dataType) n else Cast(n, o.dataType)
          Alias(e, o.name)(exprId = o.exprId, qualifier = o.qualifier)
        }
        Project(aliased, read)
    }
  }
}

/** A graft DML statement as a LAZILY-executed command node: parsing
  * produces this plan, and the mutation runs only when the plan
  * EXECUTES (`spark.sql` executes command plans eagerly, so the
  * observable `spark.sql("MERGE ...")` behavior is unchanged — one
  * `version` row, Delta's SQL DML shape). Keeping the side effect out
  * of the parser means `EXPLAIN MERGE INTO v ...` renders the plan
  * without mutating, retries/tooling that parse twice commit once per
  * EXECUTION, and `sessionState.sqlParser.parsePlan` is side-effect
  * free.
  */
final case class GraftDmlCommand(statement: String)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override val output: Seq[
      org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "version", org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] =
    Seq(org.apache.spark.sql.Row(graft.sql.GraftSql.dml(spark, statement)))
  override def simpleString(maxFields: Int): String = {
    val one = statement.replaceAll("\\s+", " ").trim
    val shown = if (one.length > 120) one.take(117) + "..." else one
    s"GraftDmlCommand $shown"
  }
}

/** The dialect parser: statements the graft SQL surface OWNS — DML on
  * a REGISTERED snapshot view, DESCRIBE HISTORY/DETAIL of one, or the
  * time-travel / change-feed read dialect — are handled by
  * [[graft.sql.GraftSql]]; everything else delegates verbatim to the
  * stock parser, so the extension is invisible outside the dialect.
  *
  * DML parses to a lazily-executed [[GraftDmlCommand]] — parsing is
  * side-effect free; the mutation happens when the command plan
  * executes (which `spark.sql` does eagerly, like any command). The
  * registration check keys on the ACTIVE session, so two sessions with
  * different registrations never see each other's views. Owned
  * statements take no bind parameters: a parameterized call refuses
  * loudly instead of silently dropping the bindings.
  */
final class GraftParser(delegate: ParserInterface) extends ParserInterface {

  private def interceptRaw(sqlText: String)
      : Option[Either[String, LogicalPlan]] =
    SparkSession.getActiveSession
      .flatMap(s => graft.sql.GraftSql.interceptSql(s, sqlText))

  override def parsePlan(sqlText: String): LogicalPlan =
    interceptRaw(sqlText) match {
      case Some(Right(plan)) => plan
      case Some(Left(rewritten)) => delegate.parsePlan(rewritten)
      case None => delegate.parsePlan(sqlText)
    }

  override def parsePlanWithParameters(sqlText: String,
      parameters: ParameterContext): LogicalPlan =
    interceptRaw(sqlText) match {
      case Some(Right(plan)) =>
        // owned statements have no parameter-marker grammar: any
        // bound argument would silently not bind — refuse loudly
        // (an unknown future ParameterContext shape refuses too,
        // rather than guessing it is empty)
        val empty = parameters match {
          case org.apache.spark.sql.catalyst.parser
            .NamedParameterContext(args) => args.isEmpty
          case org.apache.spark.sql.catalyst.parser
            .PositionalParameterContext(args) => args.isEmpty
          case org.apache.spark.sql.catalyst.parser
            .HybridParameterContext(args, _) => args.isEmpty
          case _ => false
        }
        if (!empty) throw new IllegalArgumentException(
          "graft dialect statements (DML/DESCRIBE on snapshot views) " +
            "take no bind parameters — inline the values into the " +
            s"statement text: $sqlText")
        plan
      case Some(Left(rewritten)) =>
        // read-dialect rewrite: the surrounding query may legitimately
        // carry parameters — delegate with them intact
        delegate.parsePlanWithParameters(rewritten, parameters)
      case None => delegate.parsePlanWithParameters(sqlText, parameters)
    }

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
