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
/** Read-only metadata table (`t$snapshots` / `t$refs`): rows come from a
  * driver-side manifest walk at scan-planning time and ship to the (one)
  * task inside the reader factory — there is nothing to distribute, the
  * history of any store is versions-bounded. */
private class GraftMetaTable(name0: String, schema0: StructType,
    rows: () => Seq[Seq[Any]])
  extends Table
  with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.catalog.TableCapability
  import org.apache.spark.sql.connector.read._

  override def name(): String = name0
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = schema0
      override def toBatch: Batch = this
      override def description(): String = name0
      override def planInputPartitions(): Array[InputPartition] =
        Array(GraftMetaPartition(rows().map(_.toArray)))
      override def createReaderFactory(): PartitionReaderFactory =
        new GraftMetaReaderFactory(schema0)
    }
}

private case class GraftMetaPartition(rows: Seq[Array[Any]])
  extends org.apache.spark.sql.connector.read.InputPartition

private class GraftMetaReaderFactory(schema: StructType)
  extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader}

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = p.asInstanceOf[GraftMetaPartition].rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val vals = it.next().map {
          case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
          case v => v
        }
        cur = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
}

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

  /** The warehouse THIS instance was initialized with. Spark's
    * CatalogManager caches the first-initialized instance per session,
    * so callers that mix SQL identifiers with the path-based store API
    * (e.g. tagging a catalog table) must resolve roots through the LIVE
    * instance, never through the configured option value. */
  def warehousePath: String = warehouse

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
    // Iceberg-style metadata tables: `graft.ns.`t$snapshots`` is the
    // commit history of graft.ns.t (version/files/rows/bytes off the
    // immutable manifests), `t$refs` its named tags — the pure-SQL face
    // of GraftStore.snapshots()/listRefs(). O(versions) driver-side
    // manifest reads; no data file is ever opened.
    // ONLY the known metadata suffixes take the '$' branch — a real
    // table whose name merely contains '$' must resolve normally (r12
    // ADVICE: createTable accepted such names, loadTable then 404'd)
    val dollar = ident.name.lastIndexOf('$')
    val metaSuffix = if (dollar > 0) ident.name.substring(dollar + 1) else ""
    if (metaSuffix == "snapshots" || metaSuffix == "refs") {
      val base = Identifier.of(ident.namespace, ident.name.substring(0, dollar))
      val root = rootFor(base)
      if (GraftStore.latestManifest(root, conf).isEmpty)
        throw new NoSuchTableException(base)
      metaSuffix match {
        case "snapshots" =>
          return new GraftMetaTable(s"graft_meta($root,snapshots)",
            StructType.fromDDL("version LONG NOT NULL, n_files LONG NOT NULL, " +
              "n_rows LONG NOT NULL, n_bytes LONG NOT NULL"),
            () => {
              val c = GraftStore.driverConf()
              val cur = GraftStore.currentVersion(root).getOrElse(0L)
              // header-only summaries — O(1) I/O per version
              (1L to cur).flatMap(v =>
                GraftStore.manifestSummaryAt(root, c, v).map {
                  case (nf, nr, nb) => Seq[Any](v, nf, nr, nb) })
            })
        case _ =>
          return new GraftMetaTable(s"graft_meta($root,refs)",
            StructType.fromDDL("name STRING NOT NULL, version LONG NOT NULL"),
            () => GraftStore.listRefs(root).map {
              case (n, v) => Seq[Any](n, v)
            })
      }
    }
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

  /** SQL time travel by wall clock — `SELECT ... FROM graft.ns.t
    * TIMESTAMP AS OF '<ts>'` (Spark hands the catalog MICROseconds):
    * resolves to the LATEST complete snapshot committed at or before
    * the instant. Every manifest records its commit millis (`ts=`
    * line); manifests from before that line fall back to the manifest
    * file's modification time — same clock, same filesystem. O(versions)
    * driver-side metadata walk, no data touched. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootFor(ident)
    val cur = GraftStore.currentVersion(root)
      .getOrElse(throw new NoSuchTableException(ident))
    val wantMillis = timestamp / 1000L
    val f = fsys
    def commitMillis(m: GsbManifest): Long = m.ts.getOrElse {
      val p = new HPath(new HPath(root, "manifest"),
        f"v${m.version}%020d.manifest")
      f.getFileStatus(p).getModificationTime
    }
    val hit = (cur to 1L by -1L).iterator
      .flatMap(v => GraftStore.manifestAt(root, conf, v))
      .find(m => commitMillis(m) <= wantMillis)
      .getOrElse(throw new NoSuchTableException(ident))
    new GraftStoreTable(root, hit.schema, pinned = Some(hit.version))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    // `PARTITIONED BY (col, ...)` — identity transforms only — records
    // CLUSTERING metadata: the store keeps a flat data directory, and
    // every write is required (RequiresDistributionAndOrdering) to
    // arrive range-distributed + sorted on these columns, so the
    // existing per-file min/max skipping becomes planning-time
    // partition pruning. Hive-style bucket/days/hours transforms would
    // need directory layouts the manifest deliberately avoids.
    val cluster = partitions.toSeq.map { t =>
      require(t.name == "identity" && t.references().length == 1 &&
          t.references()(0).fieldNames().length == 1,
        s"graft catalog: unsupported partition transform $t — only " +
          "top-level identity columns (PARTITIONED BY (col, ...)) " +
          "cluster a graft-store table")
      val col = t.references()(0).fieldNames()(0)
      require(schema.fieldNames.contains(col),
        s"graft catalog: partition column $col is not in the table schema")
      col
    }
    // `TBLPROPERTIES ('write.partitions'='N')` pins the clustered
    // write's range-shuffle fan-out; without it AQE sizes the shuffle
    // (advisory-sized files — right at cluster scale, but a table
    // smaller than one advisory partition lands in a single file)
    val clusterParts = Option(properties.get("write.partitions"))
      .map { p =>
        require(cluster.nonEmpty,
          "graft catalog: write.partitions requires PARTITIONED BY columns")
        val n = p.toInt
        require(n > 0, s"graft catalog: write.partitions must be positive, got $p")
        n
      }.getOrElse(0)
    val root = rootFor(ident)
    fsys.mkdirs(new HPath(root))
    // the v1 slot claim IS the existence check — atomic against racing
    // CREATEs, unlike exists()-then-create
    try GraftStore.writeManifest(root, conf, 1L, schema, Seq.empty,
      cluster = cluster, clusterParts = clusterParts)
    catch {
      case _: GsbCommitRaceException => throw new TableAlreadyExistsException(ident)
    }
    new GraftStoreTable(root, schema)
  }

  /** `ALTER TABLE ... ADD COLUMNS / DROP COLUMN / RENAME COLUMN` — the
    * DDL face of the store's evolution rules, each ONE metadata-only
    * commit with zero data movement:
    *  - ADD: a new nullable column appends to the snapshot schema;
    *    files written before it read back null-filled.
    *  - DROP: the column leaves the snapshot schema; committed files
    *    keep (and readers skip) its bytes; the name is TOMBSTONED — it
    *    can never be re-added, because old files still carry data under
    *    it and re-binding would silently resurrect that data (the
    *    problem Iceberg's field IDs solve; tombstoning is the honest
    *    equivalent for a name-keyed store). Old snapshots still present
    *    the column — history is immutable.
    *  - RENAME: the snapshot field changes name; readers resolve the
    *    rename CHAIN back to the name each file was written under; the
    *    vacated name is tombstoned like a drop.
    * Type changes stay unsupported — they would invalidate committed
    * bytes. */
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
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1,
          "graft catalog: nested column drops are not supported")
      case ren: TableChange.RenameColumn =>
        require(ren.fieldNames.length == 1,
          "graft catalog: nested column renames are not supported")
      case set: TableChange.SetProperty =>
        require(set.property == "write.partitions",
          s"graft catalog: unsupported table property ${set.property} — " +
            "only write.partitions (the clustered write fan-out) is tunable")
        require(set.value.toIntOption.exists(_ > 0),
          s"graft catalog: write.partitions must be a positive int, got " +
            s"'${set.value}'")
      case rm: TableChange.RemoveProperty =>
        require(rm.property == "write.partitions",
          s"graft catalog: unsupported table property ${rm.property}")
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER TABLE change $other — only " +
          "ADD COLUMNS / DROP COLUMN / RENAME COLUMN and SET/UNSET " +
          "TBLPROPERTIES ('write.partitions') are metadata-safe for " +
          "committed data files")
    }
    var outSchema: StructType = null
    GraftStore.commitLoop(root, conf) { prev =>
      val base = prev.getOrElse(throw new NoSuchTableException(ident))
      // clustering columns are load-bearing for the write contract and
      // the pruning story — dropping or renaming one would silently
      // detach the declared layout from the data; fail loudly instead
      // (re-clustering = CREATE a new table and INSERT, like Iceberg's
      // replace-partition-spec, which this store does not model)
      changes.foreach {
        case del: TableChange.DeleteColumn
            if base.cluster.contains(del.fieldNames()(0)) =>
          throw new IllegalArgumentException(
            s"graft catalog: ${del.fieldNames()(0)} is a clustering " +
              "(PARTITIONED BY) column and cannot be dropped")
        case ren: TableChange.RenameColumn
            if base.cluster.contains(ren.fieldNames()(0)) =>
          throw new IllegalArgumentException(
            s"graft catalog: ${ren.fieldNames()(0)} is a clustering " +
              "(PARTITIONED BY) column and cannot be renamed")
        case _ => ()
      }
      // `ALTER TABLE ... SET TBLPROPERTIES ('write.partitions'='N')` /
      // UNSET: retune the clustered write fan-out post-CREATE — one
      // metadata commit, zero data movement (takes effect on the next
      // write/compact). Requires the table to be clustered: the knob
      // means nothing without cluster columns.
      val partsOverride = changes.collect {
        case set: TableChange.SetProperty => set.value.toInt
        case _: TableChange.RemoveProperty => 0
      }.lastOption
      partsOverride.foreach(_ => require(base.cluster.nonEmpty,
        "graft catalog: write.partitions requires a PARTITIONED BY table"))
      var colops = base.colops
      def tombstones = colops.map(_.from).toSet
      outSchema = changes.foldLeft(base.schema) { (sch, ch) =>
        ch match {
          case add: TableChange.AddColumn =>
            val name = add.fieldNames()(0)
            require(!sch.fieldNames.contains(name),
              s"graft catalog: column $name already exists")
            require(!tombstones.contains(name),
              s"graft catalog: column name $name was previously dropped/" +
                "renamed away and is reserved — committed files still " +
                "carry data under it; pick a new name or overwrite the " +
                "table to reset column history")
            sch.add(org.apache.spark.sql.types.StructField(
              name, add.dataType(), nullable = true))
          case del: TableChange.DeleteColumn =>
            val name = del.fieldNames()(0)
            require(sch.fieldNames.contains(name),
              s"graft catalog: no column $name to drop")
            require(sch.length > 1,
              "graft catalog: cannot drop the last column")
            colops = colops :+ GsbColOp("drop", name, "")
            StructType(sch.fields.filterNot(_.name == name))
          case ren: TableChange.RenameColumn =>
            val from = ren.fieldNames()(0)
            val to = ren.newName()
            require(sch.fieldNames.contains(from),
              s"graft catalog: no column $from to rename")
            require(!sch.fieldNames.contains(to),
              s"graft catalog: column $to already exists")
            require(!tombstones.contains(to),
              s"graft catalog: column name $to was previously dropped/" +
                "renamed away and is reserved — committed files still " +
                "carry data under it; pick a new name or overwrite the " +
                "table to reset column history")
            colops = colops :+ GsbColOp("rename", from, to)
            StructType(sch.fields.map(f =>
              if (f.name == from) f.copy(name = to) else f))
          case _ => sch
        }
      }
      Some(GsbNext(outSchema, base.files, base.epochs, colops,
        clusterPartsOverride = partsOverride))
    }
    new GraftStoreTable(root, outSchema)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = rootFor(ident)
    if (!isTableDir(root)) false
    else {
      // a re-CREATE at this root reuses version paths — stale parsed
      // manifests must not survive the drop (ms-grained mtime alone is
      // not a safe cache key across drop/re-create)
      GraftStore.invalidateCaches(root)
      fsys.delete(new HPath(root), true)
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!isTableDir(rootFor(oldIdent))) throw new NoSuchTableException(oldIdent)
    if (isTableDir(rootFor(newIdent))) throw new TableAlreadyExistsException(newIdent)
    GraftStore.invalidateCaches(rootFor(oldIdent)) // old path may be re-created
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
