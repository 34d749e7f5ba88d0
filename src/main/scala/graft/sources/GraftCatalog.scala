package graft.sources

import java.util.{Map => JMap}

import scala.collection.JavaConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 `TableCatalog` over graft-store roots — the pure-SQL
  * front door: register once
  * (`spark.sql.catalog.graft = graft.sources.GraftCatalog`,
  * `spark.sql.catalog.graft.warehouse = <dir>`) and every snapshot store
  * becomes an ordinary SQL identifier:
  *
  * {{{
  *   CREATE TABLE graft.ds.docs (doc_id BIGINT, text STRING)
  *   INSERT INTO graft.ds.docs SELECT ...
  *   CREATE TABLE graft.ds.gold AS SELECT ... (CTAS)
  *   SELECT count(*) FROM graft.ds.docs
  * }}}
  *
  * Identifier ↔ layout: `graft.a.b.t` is the store rooted at
  * `<warehouse>/a/b/t` — namespaces are directories, a table is any
  * directory holding a complete manifest, so catalogs and the
  * path-based `format("graft-store")` API see the SAME stores (a table
  * created here can be tagged/time-traveled/streamed through the
  * existing surface and vice versa). All catalog operations are
  * O(manifest) driver-side metadata work; data movement stays in the
  * DSv2 scan/write paths, which at 100 TB is the property that matters
  * — the catalog never lists data files.
  *
  * Concurrency inherits the store's optimistic protocol: CREATE claims
  * manifest slot v1 with the exclusive-create primitive (two racing
  * CREATEs → exactly one winner, the loser gets
  * TableAlreadyExistsException), INSERT rides the commitLoop.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  private def conf = GraftStore.driverConf()
  private def fsys = GraftStore.fs(warehouse, conf)
  private def rootFor(ident: Identifier): String =
    (warehouse +: ident.namespace.toSeq :+ ident.name).mkString("/")
  private def nsPath(ns: Array[String]): HPath =
    new HPath((warehouse +: ns.toSeq).mkString("/"))
  private def isTableDir(root: String): Boolean =
    GraftStore.latestManifest(root, conf).nonEmpty

  // ------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsPath(namespace)
    if (!fsys.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fsys.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName).sorted
      .filter(n => isTableDir(rootFor(Identifier.of(namespace, n))))
      .map(Identifier.of(namespace, _))
  }

  override def loadTable(ident: Identifier): Table = {
    val root = rootFor(ident)
    val m = GraftStore.latestManifest(root, conf)
      .getOrElse(throw new NoSuchTableException(ident))
    new GraftStoreTable(root, m.schema)
  }

  /** SQL time travel — `SELECT ... FROM graft.ns.t VERSION AS OF 2` (a
    * snapshot number) or `VERSION AS OF 'release-1'` (an immutable
    * tag). The pinned table surfaces THAT snapshot's schema and scans
    * exactly its file set, same contract as `.option("version"/"ref")`
    * on the path surface. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootFor(ident)
    // an all-digit string parses as a snapshot number FIRST, but an
    // all-digit TAG (legal per RefNameRe, e.g. '2024') must stay
    // addressable: when no manifest owns that numeric version, fall
    // back to ref resolution before giving up (r11 ADVICE)
    val v =
      if (version.forall(_.isDigit) && version.nonEmpty) {
        val n = version.toLong
        if (GraftStore.manifestAt(root, conf, n).nonEmpty) n
        else try GraftStore.resolveRef(root, conf, version)
        catch { // neither a snapshot nor a tag
          case _: IllegalArgumentException => throw new NoSuchTableException(ident)
        }
      } else GraftStore.resolveRef(root, conf, version)
    val m = GraftStore.manifestAt(root, conf, v)
      .getOrElse(throw new NoSuchTableException(ident))
    new GraftStoreTable(root, m.schema, pinned = Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    require(partitions.isEmpty,
      "graft catalog: partition transforms are not supported (the store " +
        "layouts via Layout.writeZordered/bucketing instead)")
    val root = rootFor(ident)
    fsys.mkdirs(new HPath(root))
    // the v1 slot claim IS the existence check — atomic against racing
    // CREATEs, unlike exists()-then-create
    try GraftStore.writeManifest(root, conf, 1L, schema, Seq.empty)
    catch {
      case _: GsbCommitRaceException => throw new TableAlreadyExistsException(ident)
    }
    new GraftStoreTable(root, schema)
  }

  /** `ALTER TABLE ... ADD COLUMNS (...)` — the DDL face of the store's
    * widening evolution rule: a new nullable column appends to the
    * manifest schema in ONE metadata-only commit (zero data movement;
    * existing files stay valid and read back null-filled, exactly as
    * with an evolving append). Everything else — renames, drops, type
    * changes — would invalidate committed files and stays unsupported. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val root = rootFor(ident)
    if (GraftStore.latestManifest(root, conf).isEmpty)
      throw new NoSuchTableException(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          "graft catalog: nested column adds are not supported")
        require(add.isNullable,
          "graft catalog: added columns must be nullable — files written " +
            "before the column read back null-filled")
        require(add.position() == null,
          "graft catalog: column position is not supported — new columns " +
            "append at the end (the widening rule)")
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER TABLE change $other — only " +
          "ADD COLUMNS (nullable, top-level) is metadata-safe for " +
          "committed data files")
    }
    var outSchema: StructType = null
    GraftStore.commitLoop(root, conf) { prev =>
      val base = prev.getOrElse(throw new NoSuchTableException(ident))
      outSchema = changes.foldLeft(base.schema) { (sch, ch) =>
        val add = ch.asInstanceOf[TableChange.AddColumn]
        val name = add.fieldNames()(0)
        require(!sch.fieldNames.contains(name),
          s"graft catalog: column $name already exists")
        sch.add(org.apache.spark.sql.types.StructField(
          name, add.dataType(), nullable = true))
      }
      Some((outSchema, base.files, base.epochs))
    }
    new GraftStoreTable(root, outSchema)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = rootFor(ident)
    if (!isTableDir(root)) false
    else fsys.delete(new HPath(root), true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!isTableDir(rootFor(oldIdent))) throw new NoSuchTableException(oldIdent)
    if (isTableDir(rootFor(newIdent))) throw new TableAlreadyExistsException(newIdent)
    fsys.mkdirs(nsPath(newIdent.namespace))
    if (!fsys.rename(new HPath(rootFor(oldIdent)), new HPath(rootFor(newIdent))))
      throw new IllegalStateException(
        s"graft catalog: rename ${oldIdent} -> ${newIdent} failed")
  }

  // --------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] = {
    val base = new HPath(warehouse)
    if (!fsys.exists(base)) Array.empty
    else fsys.listStatus(base).filter(_.isDirectory)
      .map(st => Array(st.getPath.getName)).sortBy(_.head)
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val dir = nsPath(namespace)
    if (!fsys.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fsys.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName).sorted
      .filter(n => !isTableDir((warehouse +: namespace.toSeq :+ n).mkString("/")))
      .map(n => namespace :+ n)
  }

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!fsys.exists(nsPath(namespace))) throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    fsys.mkdirs(nsPath(namespace))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces carry no metadata to alter")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = nsPath(namespace)
    if (!fsys.exists(dir)) false
    else {
      if (!cascade && fsys.listStatus(dir).nonEmpty)
        throw new IllegalStateException(
          s"graft catalog: namespace ${namespace.mkString(".")} is not empty")
      fsys.delete(dir, cascade)
    }
  }
}
