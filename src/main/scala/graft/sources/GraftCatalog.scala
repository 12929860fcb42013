package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{
  NamespaceAlreadyExistsException, NoSuchNamespaceException,
  NoSuchTableException, NonEmptyNamespaceException,
  TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange,
  SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Name-based SQL over managed tables — a DSv2 [[TableCatalog]] that
  * maps `catalog.ns….table` onto the [[ManagedTable]] directory layout
  * under one warehouse root, so the WHOLE SQL surface works without a
  * path in sight:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/wh")
  *   sql("CREATE NAMESPACE graft.corpus")
  *   sql("CREATE TABLE graft.corpus.docs (doc_id BIGINT, text STRING)")
  *   sql("INSERT INTO graft.corpus.docs SELECT ...")
  *   sql("SELECT count(*) FROM graft.corpus.docs")          // manifest-only
  *   sql("SELECT * FROM graft.corpus.docs VERSION AS OF 1") // time travel
  * }}}
  *
  * The catalog is METADATA-ONLY glue: every data/manifest byte is
  * written and read by the same [[ManagedTable]]/[[GraftDataSource]]
  * code paths as the path-based API, so path users and SQL users see
  * one table format (same versions, tags, stats, DVs, time travel).
  * Identifier → directory is pure (`warehouse/ns…/name`), so the
  * catalog keeps NO state of its own — any number of concurrent
  * drivers resolve the same names to the same directories and the
  * manifest log's create-if-absent protocol arbitrates writes, which
  * is what lets a 1000-executor cluster and an ad-hoc laptop session
  * share a warehouse with no catalog service in between.
  *
  *   - `CREATE TABLE` commits version 1 with the declared schema and
  *     zero rows (an empty version reads back typed — the manifest is
  *     the schema authority).
  *   - `CREATE TABLE … AS SELECT` is create + append (non-atomic
  *     across the pair, like any non-staging v2 catalog; each half is
  *     atomic).
  *   - `VERSION AS OF n` resolves through [[GraftTableMeta.resolve]];
  *     `TIMESTAMP AS OF` resolves to the newest version whose manifest
  *     was committed at or before the timestamp (manifest mtime —
  *     the commit instant the filesystem itself records).
  *   - `INSERT INTO` appends; `INSERT OVERWRITE` truncates (the
  *     [[GraftWriteBuilder]] write path with its schema gate).
  *   - `DROP TABLE` / `DROP NAMESPACE [CASCADE]` delete directories.
  *   - `CALL <catalog>.system.compact|vacuum|vacuum_history|restore|
  *     history(…)` runs table MAINTENANCE by name
  *     ([[GraftProcedures]]) — the scheduled-operations surface a
  *     pure-SQL operator needs.
  *   - `ALTER TABLE … ADD COLUMNS` widens the schema as ONE
  *     metadata-only manifest commit ([[ManagedTable.evolveSchema]] —
  *     the same evolution [[ManagedTable.merge]] records implicitly);
  *     pre-evolution segments null-fill at read time. Drops/renames/
  *     retypes stay rejected (they would strand committed data).
  *
  * Reference anchor: the catalog/schema DDL of
  * /root/reference/notebooks/01_Environment_Setup.py:21-38 (CREATE
  * CATALOG/SCHEMA/TABLE over managed storage), re-expressed as a
  * Spark-native catalog plugin.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  /** Column DEFAULT values at CREATE TABLE: Spark's analyzer stores
    * the default in the column metadata (which rides the manifest's
    * schema json) and fills it into INSERTs that omit the column —
    * the catalog only has to declare the capability and persist the
    * metadata. ALTER ADD COLUMNS with a DEFAULT is rejected
    * ([[alterTable]]): existing segments null-fill at read, and
    * silently reading null where the user declared a default would be
    * a wrong answer, not a missing feature.
    */
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog
        .TableCatalogCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null && warehouse.nonEmpty,
      s"graft catalog '$name': set spark.sql.catalog.$name.warehouse")
  }
  override def name(): String = catalogName

  private def spark = SparkSession.active
  private def fs(p: HPath): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Identifier → directory is PURE; name segments must be safe as
    * single path components.
    */
  private def checkSegment(s: String): String = {
    require(s.nonEmpty && !s.contains("/") && !s.contains("\\") &&
      s != "." && s != "..",
      s"graft catalog: illegal name segment '$s'")
    s
  }
  private def nsPath(ns: Array[String]): HPath =
    ns.foldLeft(new HPath(warehouse))((p, s) =>
      new HPath(p, checkSegment(s)))
  private def tableDir(ident: Identifier): String =
    new HPath(nsPath(ident.namespace()),
      checkSegment(ident.name())).toString

  private def isTable(dir: String): Boolean =
    ManagedTable.versions(spark, dir).nonEmpty

  // ---- tables -----------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    if (!fs(p).exists(p)) throw new NoSuchNamespaceException(namespace)
    fs(p).listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => isTable(new HPath(p, n).toString))
      .sorted
      .map(n => Identifier.of(namespace, n))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(tableDir(ident))

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    new GraftTable(GraftTableMeta.resolve(dir, None))
  }

  /** `VERSION AS OF <n>` */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val v = version.toIntOption.getOrElse(throw new IllegalArgumentException(
      s"graft: VERSION AS OF wants an integer version, got '$version'"))
    new GraftTable(GraftTableMeta.resolve(dir, Some(v)), pinned = true)
  }

  /** `TIMESTAMP AS OF <t>` (µs since epoch): newest version whose
    * manifest exists at or before `t` — the filesystem's own record of
    * the commit instant, same resolution rule as Delta's.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val md = new HPath(dir, "_manifest")
    val cutoffMs = Math.floorDiv(timestampMicros, 1000L)
    val vs = fs(md).listStatus(md).toSeq
      .filter(st => st.getPath.getName.startsWith("v") &&
        st.getPath.getName.endsWith(".json") &&
        st.getModificationTime <= cutoffMs)
      .flatMap(st => st.getPath.getName.stripPrefix("v")
        .stripSuffix(".json").toIntOption)
    require(vs.nonEmpty,
      s"graft: no version of ${ident} committed at or before " +
        s"timestamp ${timestampMicros}µs")
    new GraftTable(GraftTableMeta.resolve(dir, Some(vs.max)),
      pinned = true)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): Table = {
    // `CLUSTER BY (a, b)` is the DECLARATIVE layout contract: persist
    // it as the graft.clusterBy property, and every data-landing
    // write range-clusters on it from the first INSERT (file-level
    // stats pruning then plays the partition role with no manual
    // CALL). Hash/bucket/identity PARTITIONED BY stays rejected —
    // stats pruning subsumes it without directory explosion.
    val clusterCols: Seq[String] = partitions.toSeq.flatMap {
      case org.apache.spark.sql.connector.expressions
          .ClusterByTransform(refs) =>
        refs.map { r =>
          require(r.fieldNames.length == 1,
            "graft: CLUSTER BY supports top-level columns only, got " +
              r.fieldNames.mkString("."))
          r.fieldNames()(0)
        }
      case other => throw new UnsupportedOperationException(
        s"graft: PARTITIONED BY ($other) is not supported — " +
          "file-level stats pruning plays the partition role " +
          "(q67/q116 layout discipline); declare layout with " +
          "CLUSTER BY instead")
    }
    clusterCols.foreach { c =>
      require(schema.fieldNames.contains(c),
        s"graft: CLUSTER BY column '$c' is not in the table schema")
    }
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    val parent = nsPath(ident.namespace())
    if (!fs(parent).exists(parent))
      throw new NoSuchNamespaceException(ident.namespace())
    schema.fields.foreach { f =>
      require(GraftTableMeta.supported(f.dataType),
        s"graft: unsupported column type ${f.dataType.sql} for " +
          s"'${f.name}'")
    }
    ManagedTable.commit(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
      dir, tag = "create")
    // user TBLPROPERTIES (the reference declares quality tiers this
    // way on every DLT table — notebooks/03_Data_Ingestion.py:62) land
    // in the __table ledger; engine-reserved keys are not properties
    val userProps = properties.asScala.toMap --
      Seq("provider", "location", "owner", "comment", "external",
        "path") ++
      (if (clusterCols.nonEmpty)
        Map(ManagedTable.ClusterByProp -> clusterCols.mkString(","))
      else Map.empty)
    userProps.get(ManagedTable.ClusterByProp).foreach { v =>
      // a clusterBy set via raw TBLPROPERTIES gets the same validation
      ManagedTable.clusterByOf(Map(ManagedTable.ClusterByProp -> v))
        .foreach { c =>
          require(schema.fieldNames.contains(c),
            s"graft: clusterBy column '$c' is not in the table schema")
        }
    }
    if (userProps.nonEmpty)
      ManagedTable.setTableProperties(spark, dir, userProps,
        tag = "create")
    new GraftTable(GraftTableMeta.resolve(dir, None))
  }

  /** `ALTER TABLE …` schema DDL, each shape ONE metadata-only
    * manifest commit regardless of table size:
    *
    *   - **ADD COLUMNS (…)** — the SAME manifest-recorded schema
    *     evolution [[ManagedTable.merge]] performs implicitly:
    *     existing segments null-fill at read time, and post-evolution
    *     INSERTs flow through the ordinary write gate (top-level,
    *     nullable, stats-tier type, appended last). Re-adding a
    *     previously DROPPED name maps to a fresh physical column (the
    *     retired ledger — see [[ColumnMapping]]), never the dead
    *     one's bytes.
    *   - **RENAME COLUMN a TO b** — [[ManagedTable.renameColumn]]:
    *     the field keeps the physical name baked into committed
    *     segments; only the logical name moves.
    *   - **DROP COLUMN a** — [[ManagedTable.dropColumn]]: the field
    *     leaves the schema, its bytes stay (unread) and age out with
    *     history retention.
    *
    * Retypes stay rejected (they would strand committed data bytes —
    * a widening CAST rewrite is a different, data-moving operation).
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    def topLevel(what: String, names: Array[String]): String = {
      require(names.length == 1,
        s"graft: ALTER TABLE $what supports top-level columns " +
          s"only, got ${names.mkString(".")}")
      names(0)
    }
    // ADDs batch into one evolution commit, SET/UNSET TBLPROPERTIES
    // into one ledger commit (Spark sends one change per column /
    // property of a single statement); renames/drops are one commit
    // each, applied in statement order
    var pendingAdds = GraftTableMeta.resolve(dir, None).schema
    var addsPending = false
    def flushAdds(): Unit = if (addsPending) {
      ManagedTable.evolveSchema(spark, dir, pendingAdds, tag = "alter")
      addsPending = false
    }
    var pendingSet = Map.empty[String, String]
    var pendingUnset = Seq.empty[String]
    def flushProps(): Unit =
      if (pendingSet.nonEmpty || pendingUnset.nonEmpty) {
        ManagedTable.setTableProperties(spark, dir, pendingSet,
          pendingUnset, tag = "alter")
        pendingSet = Map.empty; pendingUnset = Nil
      }
    changes.foreach {
      case add: TableChange.AddColumn =>
        val colName = topLevel("ADD COLUMNS", add.fieldNames())
        require(add.defaultValue() == null,
          s"graft: ADD COLUMNS '$colName' with a DEFAULT is not " +
            "supported — existing segments read null for added " +
            "columns (declare defaults at CREATE TABLE, or backfill " +
            "with UPDATE after adding)")
        require(!pendingAdds.fieldNames.contains(colName),
          s"graft: column '$colName' already exists in $ident")
        require(add.isNullable,
          s"graft: added column '$colName' must be nullable — " +
            "existing segments read null there")
        require(add.position() == null,
          "graft: ALTER TABLE ADD COLUMNS appends at the end — " +
            "FIRST/AFTER positions are not supported")
        require(GraftTableMeta.supported(add.dataType()),
          s"graft: unsupported column type ${add.dataType().sql} for " +
            s"'$colName'")
        pendingAdds = pendingAdds.add(org.apache.spark.sql.types.StructField(
          colName, add.dataType(), nullable = true))
        addsPending = true
      case rn: TableChange.RenameColumn =>
        flushAdds(); flushProps()
        ManagedTable.renameColumn(spark, dir,
          topLevel("RENAME COLUMN", rn.fieldNames()), rn.newName(),
          tag = "alter")
        pendingAdds = GraftTableMeta.resolve(dir, None).schema
      case del: TableChange.DeleteColumn =>
        flushAdds(); flushProps()
        val colName = topLevel("DROP COLUMN", del.fieldNames())
        ManagedTable.dropColumn(spark, dir, colName, tag = "alter")
        pendingAdds = GraftTableMeta.resolve(dir, None).schema
      case sp: TableChange.SetProperty =>
        pendingSet += sp.property -> sp.value
      case rp: TableChange.RemoveProperty =>
        pendingUnset :+= rp.property
      case ut: TableChange.UpdateColumnType =>
        flushAdds(); flushProps()
        ManagedTable.widenColumn(spark, dir,
          topLevel("ALTER COLUMN TYPE", ut.fieldNames()),
          ut.newDataType(), tag = "alter")
        pendingAdds = GraftTableMeta.resolve(dir, None).schema
      case cb: TableChange.ClusterBy =>
        // `ALTER TABLE … CLUSTER BY (a, b)` re-declares the layout
        // contract; `CLUSTER BY NONE` (empty list) drops it. Purely a
        // property move — already-landed files keep their layout and
        // age into the new one through writes and compaction.
        flushAdds()
        val cols = cb.clusteringColumns().toSeq.map { r =>
          require(r.fieldNames.length == 1,
            "graft: CLUSTER BY supports top-level columns only, got " +
              r.fieldNames.mkString("."))
          r.fieldNames()(0)
        }
        cols.foreach { c =>
          require(pendingAdds.fieldNames.contains(c),
            s"graft: CLUSTER BY column '$c' is not in the table schema")
        }
        if (cols.isEmpty) pendingUnset :+= ManagedTable.ClusterByProp
        else pendingSet += ManagedTable.ClusterByProp -> cols.mkString(",")
      case other =>
        throw new UnsupportedOperationException(
          s"graft: ALTER TABLE change ${other.getClass.getSimpleName} " +
            "is not supported — ADD COLUMNS, RENAME COLUMN, DROP " +
            "COLUMN, SET/UNSET TBLPROPERTIES and widening ALTER " +
            "COLUMN TYPE are (all metadata-only); narrowing or " +
            "cross-family retypes would strand committed data")
    }
    flushAdds()
    flushProps()
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!isTable(dir)) return false
    fs(new HPath(dir)).delete(new HPath(dir), true)
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    val from = tableDir(oldIdent)
    val to = tableDir(newIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    if (isTable(to)) throw new TableAlreadyExistsException(newIdent)
    val toParent = nsPath(newIdent.namespace())
    if (!fs(toParent).exists(toParent))
      throw new NoSuchNamespaceException(newIdent.namespace())
    require(fs(new HPath(from)).rename(new HPath(from), new HPath(to)),
      s"graft: rename $from -> $to failed")
  }

  // ---- procedures (SQL CALL — maintenance by name) ---------------

  /** `'ns.sub.table'` (a procedure's table argument) → directory,
    * through the same pure mapping every table identifier uses.
    */
  private[sources] def resolveTableDir(qualified: String): String = {
    val parts = qualified.split("\\.")
    require(parts.nonEmpty && parts.forall(_.nonEmpty),
      s"graft: procedure table argument '$qualified' must be " +
        "'ns….table' relative to this catalog")
    val dir = tableDir(Identifier.of(parts.dropRight(1), parts.last))
    if (!isTable(dir))
      throw new NoSuchTableException(
        Identifier.of(parts.dropRight(1), parts.last))
    dir
  }

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(this, ident)

  override def listProcedures(namespace: Array[String])
      : Array[Identifier] =
    if (namespace.sameElements(GraftProcedures.Namespace))
      GraftProcedures.Names
        .map(n => Identifier.of(GraftProcedures.Namespace, n)).toArray
    else Array.empty

  // ---- namespaces -------------------------------------------------

  private def childDirs(p: HPath): Seq[String] =
    if (!fs(p).exists(p)) Seq.empty
    else fs(p).listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).sorted

  override def listNamespaces(): Array[Array[String]] =
    childDirs(new HPath(warehouse))
      .filterNot(n => isTable(new HPath(warehouse, n).toString))
      .map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    val p = nsPath(namespace)
    if (!fs(p).exists(p)) throw new NoSuchNamespaceException(namespace)
    childDirs(p)
      .filterNot(n => isTable(new HPath(p, n).toString))
      .map(namespace :+ _).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val p = nsPath(namespace)
    namespace.nonEmpty && fs(p).exists(p) && !isTable(p.toString)
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : JMap[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Map(SupportsNamespaces.PROP_LOCATION ->
      nsPath(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    val p = nsPath(namespace)
    if (fs(p).exists(p))
      throw new NamespaceAlreadyExistsException(namespace)
    require(fs(p).mkdirs(p), s"graft: mkdirs $p failed")
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft: ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    if (!namespaceExists(namespace)) return false
    if (!cascade && childDirs(p).nonEmpty)
      throw new NonEmptyNamespaceException(namespace)
    fs(p).delete(p, true)
  }
}
