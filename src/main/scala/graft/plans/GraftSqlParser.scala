package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, Expression, SortOrder}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL front-end extension tier (`SparkSessionExtensions.injectParser`) —
  * the last extension surface after functions, optimizer rules, and
  * planner strategies: a delegating parser that adds ONE statement form
  *
  *   TOPK <k> FROM <table> PARTITION BY <cols> ORDER BY <col> [DESC][, ...]
  *
  * and lowers it straight to [[TopKPerKeyNode]] — the bounded-heap
  * whole-operator plan — instead of the shuffle-everything window
  * spelling a SQL user would otherwise write. Everything else passes
  * through to Spark's own parser verbatim, so the extension is purely
  * additive: installed via `GraftExtensions` (`injectParser`) at session
  * build, or used directly against a live session's parser.
  *
  * Table and column references stay UNRESOLVED here (`UnresolvedRelation`
  * / `UnresolvedAttribute`): the analyzer resolves them against the
  * session catalog exactly as for built-in syntax, so temp views,
  * catalog tables, and nested field names all work for free.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseTopK(sqlText).getOrElse(delegate.parsePlan(sqlText))
  // parseQuery must reject non-query statements; TOPK is always a query
  override def parseQuery(sqlText: String): LogicalPlan =
    GraftSqlParser.parseTopK(sqlText).getOrElse(delegate.parseQuery(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  private val Stmt =
    ("""(?is)\s*TOPK\s+(\d+)\s+FROM\s+([\w.]+)""" +
      """\s+PARTITION\s+BY\s+(.+?)\s+ORDER\s+BY\s+(.+?)\s*;?\s*""").r

  /** Some(plan) iff `sql` is a TOPK statement; syntax errors inside a
    * recognized TOPK statement throw rather than falling through, so a
    * typo'd TOPK is reported as such instead of as Spark-parser noise. */
  def parseTopK(sql: String): Option[LogicalPlan] = sql match {
    case Stmt(k, table, keys, order) =>
      val keyExprs: Seq[Expression] =
        keys.split(",").toSeq.map(c => attr(c, "PARTITION BY"))
      val sortOrders = order.split(",").toSeq.map { item =>
        item.trim.split("""\s+""").toSeq match {
          case Seq(c)       => SortOrder(attr(c, "ORDER BY"), Ascending)
          case Seq(c, dir) if dir.equalsIgnoreCase("ASC") =>
            SortOrder(attr(c, "ORDER BY"), Ascending)
          case Seq(c, dir) if dir.equalsIgnoreCase("DESC") =>
            SortOrder(attr(c, "ORDER BY"), Descending)
          case other => throw new IllegalArgumentException(
            s"TOPK: bad ORDER BY item '${other.mkString(" ")}'")
        }
      }
      Some(TopKPerKeyNode(k.toInt, keyExprs, sortOrders,
        UnresolvedRelation(table.split("""\.""").toIndexedSeq)))
    case _ => None
  }

  private def attr(raw: String, clause: String): UnresolvedAttribute = {
    val name = raw.trim
    if (name.isEmpty || !name.matches("""[\w.]+"""))
      throw new IllegalArgumentException(s"TOPK: bad $clause column '$raw'")
    UnresolvedAttribute(name.split("""\.""").toIndexedSeq)
  }
}
