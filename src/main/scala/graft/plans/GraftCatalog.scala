package graft.plans

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.snapshot.SnapshotLog

/** A DataSource V2 `TableCatalog` over snapshot tables — the catalog
  * face of the table format: install with
  *
  * {{{
  * spark.sql.catalog.graft      = graft.plans.GraftCatalog
  * spark.sql.catalog.graft.root = /path/to/catalog/root
  * }}}
  *
  * and `graft.ns.t` resolves to the snapshot table at `<root>/ns/t`
  * with NO registration step: `CREATE TABLE` / CTAS / `INSERT INTO` /
  * `SELECT` / `SHOW TABLES` / `DROP TABLE` run through stock Spark
  * (reads substitute the manifest-planned snapshot read during
  * analysis — [[GraftTableResolution]], injected by
  * [[GraftExtensions]]; writes ride the V1Write fallback into
  * [[SnapshotLog.commit]]), and the graft DML dialect (MERGE / UPDATE
  * / DELETE / OPTIMIZE / ...) accepts catalog-qualified targets
  * directly. The filesystem is the catalog state — two sessions (or
  * two clusters) pointing at the same root see the same tables, the
  * cross-session visibility a temp-view registration can never give.
  *
  * Layout under the root: a directory with a `_log` manifest dir IS a
  * table; any other directory is a namespace (arbitrarily nested).
  * Catalog-level table properties (`stats.cols`, `merge.strategy`,
  * and anything else passed to CREATE TABLE) persist in
  * `_log/_tblprops.json` — outside the manifest chain, so they ride
  * along without versioning (vacuum/retention never touch `_log`
  * sidecars).
  *
  * Reference behavior: the reference keeps its dataset registry as
  * caller-held config (reference `sdata/dataset.py`); a Spark-native
  * engine expresses the same discoverability through the catalog API
  * so every Spark surface (SQL, `spark.table`, SHOW/DESCRIBE) sees
  * the tables.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = _
  private var rootDir: String = _

  override def name(): String = catName

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    rootDir = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' needs spark.sql.catalog.$name.root = <dir>"))
      .stripSuffix("/")
  }

  override def defaultNamespace(): Array[String] = Array.empty

  private def spark: SparkSession = SparkSession.active

  private def fs: FileSystem =
    new Path(rootDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dirOf(parts: Seq[String]): Path =
    new Path((rootDir +: parts).mkString("/"))

  /** A directory with a `_log` child is a table; no listing needed. */
  private def isTable(p: Path): Boolean = fs.exists(new Path(p, "_log"))

  private[graft] def tablePath(ident: Identifier): String =
    dirOf(ident.namespace.toSeq :+ ident.name).toString

  // ---- namespaces --------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    val d = dirOf(namespace.toSeq)
    if (namespace.nonEmpty && !fs.exists(d))
      throw new NoSuchNamespaceException(catName +: namespace.toSeq)
    if (!fs.exists(d)) Array.empty
    else fs.listStatus(d)
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_")
        && !isTable(st.getPath))
      .map(st => namespace :+ st.getPath.getName)
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val d = dirOf(namespace.toSeq)
    namespace.isEmpty || (fs.exists(d) && !isTable(d))
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catName +: namespace.toSeq)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    val d = dirOf(namespace.toSeq)
    if (fs.exists(d)) throw new org.apache.spark.sql.catalyst.analysis
      .NamespaceAlreadyExistsException((catName +: namespace.toSeq).toArray)
    fs.mkdirs(d)
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no metadata to alter")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val d = dirOf(namespace.toSeq)
    if (!fs.exists(d) || isTable(d)) false
    else {
      if (!cascade && fs.listStatus(d).nonEmpty)
        throw new IllegalStateException(
          s"namespace ${namespace.mkString(".")} is not empty " +
            "(use CASCADE)")
      fs.delete(d, true)
    }
  }

  // ---- tables ------------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = dirOf(namespace.toSeq)
    if (!fs.exists(d)) {
      if (namespace.isEmpty) return Array.empty
      throw new NoSuchNamespaceException(catName +: namespace.toSeq)
    }
    fs.listStatus(d)
      .filter(st => st.isDirectory && isTable(st.getPath))
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(new Path(tablePath(ident)))

  override def loadTable(ident: Identifier): Table =
    loadAt(ident, None)

  /** `VERSION AS OF <n | 'tag'>` — a numeric version, or a tag name
    * resolved through the table's tag sidecars.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val t = tablePath(ident)
    val v =
      if (version.matches("\\d+")) version.toLong
      else SnapshotLog.tags(spark, t).getOrElse(version,
        throw new IllegalArgumentException(
          s"no tag '$version' on ${ident.name} " +
            s"(tags: ${SnapshotLog.tags(spark, t).keys.toSeq.sorted})"))
    loadAt(ident, Some(v))
  }

  /** `TIMESTAMP AS OF` — Spark hands micros since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val t = tablePath(ident)
    val v = SnapshotLog.versionAt(spark, t, timestamp / 1000L).getOrElse(
      throw new IllegalArgumentException(
        s"no version of ${ident.name} at or before timestamp " +
          s"${timestamp / 1000L} ms"))
    loadAt(ident, Some(v))
  }

  private def loadAt(ident: Identifier, version: Option[Long]): Table = {
    val t = tablePath(ident)
    val latest = SnapshotLog.latestVersion(spark, t).getOrElse(
      throw new NoSuchTableException(ident))
    val v = version.getOrElse(latest)
    val m = SnapshotLog.manifest(spark, t, v)
    GraftTable(catName, ident, t, version,
      StructType.fromDDL(m.schemaDdl), GraftCatalog.tableProps(spark, t))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String])
      : Table = {
    require(partitions.isEmpty,
      "graft tables take no PARTITIONED BY transforms — declare a " +
        "clustering layout with ALTER TABLE ... CLUSTER BY (...) INTO " +
        "n BUCKETS (metadata-only; OPTIMIZE conforms existing files)")
    val t = tablePath(ident)
    if (isTable(new Path(t))) throw new TableAlreadyExistsException(ident)
    val parent = dirOf(ident.namespace.toSeq)
    if (ident.namespace.nonEmpty && !fs.exists(parent))
      throw new NoSuchNamespaceException(catName +: ident.namespace.toSeq)
    val props = properties.asScala.toMap
      .filterNot { case (k, _) =>
        k.startsWith(TableCatalog.OPTION_PREFIX) ||
          k == TableCatalog.PROP_OWNER || k == TableCatalog.PROP_PROVIDER ||
          k == TableCatalog.PROP_LOCATION ||
          k == TableCatalog.PROP_TABLE_TYPE ||
          k == TableCatalog.PROP_IS_MANAGED_LOCATION ||
          k == TableCatalog.PROP_EXTERNAL
      }
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    SnapshotLog.commit(empty, t, "append", GraftCatalog.statsColsOf(props))
    if (props.nonEmpty) GraftCatalog.writeTableProps(spark, t, props)
    GraftTable(catName, ident, t, None, schema, props)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER through the graft SQL dialect instead — ALTER TABLE " +
        s"$catName.${(ident.namespace :+ ident.name).mkString(".")} " +
        "RENAME COLUMN / ADD COLUMN / DROP COLUMN / ADD CONSTRAINT / " +
        "CLUSTER BY are all intercepted before this hook is reached")

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(tablePath(ident))
    if (!isTable(p)) false else fs.delete(p, true)
  }

  override def purgeTable(ident: Identifier): Boolean = dropTable(ident)

  /** Manifests record table-RELATIVE data paths, so a rename is one
    * directory move — no manifest rewrite at any table size.
    */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier)
      : Unit = {
    val from = new Path(tablePath(oldIdent))
    val to = new Path(tablePath(newIdent))
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    if (fs.exists(to)) throw new TableAlreadyExistsException(newIdent)
    val parent = dirOf(newIdent.namespace.toSeq)
    if (newIdent.namespace.nonEmpty && !fs.exists(parent))
      throw new NoSuchNamespaceException(catName +: newIdent.namespace.toSeq)
    require(fs.rename(from, to), s"rename $from -> $to failed")
  }
}

object GraftCatalog {

  private[graft] def statsColsOf(props: Map[String, String]): Seq[String] =
    props.get("stats.cols").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  private def propsPath(table: String): Path =
    new Path(table, "_log/_tblprops.json")

  private def jq(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private[graft] def writeTableProps(spark: SparkSession, table: String,
      props: Map[String, String]): Unit = {
    val p = propsPath(table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val json = props.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jq(k)}: ${jq(v)}" }
      .mkString("{", ", ", "}")
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  private val PropRe = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r

  private def junq(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case c => sb.append(c); i += 2
        }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private[graft] def tableProps(spark: SparkSession,
      table: String): Map[String, String] = {
    val p = propsPath(table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val bytes =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          var n = in.read(tmp)
          while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
          buf.toByteArray
        } finally in.close()
      PropRe.findAllMatchIn(new String(bytes, "UTF-8"))
        .map(m => junq(m.group(1)) -> junq(m.group(2))).toMap
    }
  }
}

/** A snapshot table as seen through [[GraftCatalog]]. Reads never go
  * through a DSv2 scan: [[GraftTableResolution]] swaps the relation
  * for the manifest-planned snapshot read (DV masks, eq-delete
  * anti-joins, column mapping, file skipping — the full read path)
  * during analysis, so Catalyst pushdown and pruning see ordinary
  * parquet scans. Writes ride the V1Write fallback: `INSERT INTO`
  * appends, `INSERT OVERWRITE` / truncate-shaped overwrites replace —
  * both as ordinary [[SnapshotLog.commit]]s with the table's declared
  * stats columns.
  */
final case class GraftTable(catalogName: String, ident: Identifier,
    path: String, pinnedVersion: Option[Long], tableSchema: StructType,
    props: Map[String, String]) extends Table with SupportsWrite {

  override def name(): String =
    (catalogName +: ident.namespace.toSeq :+ ident.name).mkString(".")

  override def schema(): StructType = tableSchema

  override def properties(): util.Map[String, String] = props.asJava

  override def version(): String = pinnedVersion.map(_.toString).orNull

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedVersion.isEmpty,
      s"${name()} is pinned to version ${pinnedVersion.get} (time " +
        "travel) — writes go to the table head, not a historical version")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: org.apache.spark.sql.DataFrame,
                ovw: Boolean): Unit = {
              SnapshotLog.commit(data, path,
                if (overwrite || ovw) "overwrite" else "append",
                GraftCatalog.statsColsOf(props))
              ()
            }
          }
      }
    }
  }
}
