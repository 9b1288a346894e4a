package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.{GraftSqlShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.store.UpsertTable

/** SQL table-valued function `table_ref` — the pure-SQL surface of
  * named snapshot refs (tags + branches, [[UpsertTable.createTag]] /
  * [[UpsertTable.createBranch]]), the Iceberg `VERSION AS OF 'ref'`
  * role for a consumer who speaks only SQL:
  *
  * {{{
  *   SELECT * FROM table_ref('cat.ns.tbl', 'main')      -- publish branch
  *   SELECT * FROM table_ref('cat.ns.tbl', 'baseline')  -- audit tag
  * }}}
  *
  * Returns the table AS OF the version the ref pins — the exact rows
  * [[UpsertTable.readRef]] serves, so the WAP pattern (write to head,
  * audit, fast-forward `main`) is consumable end-to-end from SQL: a
  * dashboard reading `table_ref(.., 'main')` can never observe an
  * unaudited commit. A missing ref, unknown table, or unconfigured
  * catalog fails ANALYSIS loudly.
  *
  * Identifier/catalog resolution is [[GraftTableChanges]]'s contract
  * verbatim (fully-qualified `'catalog.namespace.table'` against a
  * configured [[GraftCatalog]] warehouse). Scale: expansion is a
  * driver-side manifest read; the returned plan is the ordinary
  * pinned-version scan (vectorized parquet over the ref version's
  * file list) — identical cost to any time-travel read.
  */
object GraftTableRef {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"table_ref: $msg")

  def build(args: Seq[Expression]): LogicalPlan = {
    val (ident, refName) = args match {
      case Seq(Literal(s: UTF8String, StringType),
          Literal(r: UTF8String, StringType)) =>
        (s.toString, r.toString)
      case _ => fail("usage: table_ref('catalog.namespace.table', " +
        "'refName') with literal arguments")
    }
    val parts = ident.split('.')
    if (parts.length < 3)
      fail(s"'$ident' must be fully qualified 'catalog.namespace.table'")
    val spark = SparkSession.active
    val cat = parts.head
    val clazz = spark.conf.getOption(s"spark.sql.catalog.$cat")
    if (!clazz.contains(classOf[GraftCatalog].getName))
      fail(s"'$cat' is not a configured graft catalog " +
        s"(spark.sql.catalog.$cat=${clazz.getOrElse("<unset>")})")
    val warehouse = spark.conf.getOption(s"spark.sql.catalog.$cat.warehouse")
      .getOrElse(fail(s"catalog '$cat' has no warehouse configured"))
    val dir = parts.tail.foldLeft(java.nio.file.Paths.get(warehouse))(
      _.resolve(_))
    if (!Files.isDirectory(dir))
      fail(s"table '$ident' not found at $dir")
    val t = UpsertTable(spark, dir.toString)
    val version =
      try t.refVersion(refName)
      catch { case e: IllegalStateException => fail(e.getMessage) }
    GraftSqlShims.planOf(t.readVersion(version))
  }
}
