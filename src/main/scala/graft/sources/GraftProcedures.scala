package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure,
  ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL `CALL` surface for table MAINTENANCE — the operations a table
  * needs run on a schedule (compaction, retention GC, restore) exposed
  * through Spark's DSv2 procedure SPI, so a pure-SQL operator can run
  * them by name with zero Scala in sight (Iceberg's
  * `CALL cat.system.…` shape, over the manifest log):
  *
  * {{{
  *   CALL graft.system.compact(`table` => 'ns.t')
  *   CALL graft.system.vacuum_history(`table` => 'ns.t', retain_versions => 7)
  *   CALL graft.system.vacuum(`table` => 'ns.t')
  *   CALL graft.system.restore(`table` => 'ns.t', version => 3)
  *   CALL graft.system.history(`table` => 'ns.t')
  * }}}
  *
  * Each procedure resolves `ns.t` against THIS catalog's warehouse
  * (the same pure identifier→directory mapping every table name
  * uses), executes the corresponding [[ManagedTable]] operation, and
  * returns its outcome as rows (a driver-local [[LocalScan]] — every
  * result here is metadata-scale by construction). Procedures are
  * side-effecting, so they are declared non-deterministic and Spark
  * executes each CALL exactly once.
  */
private[sources] object GraftProcedures {

  /** Procedure identifiers live under the `system` namespace. */
  val Namespace: Array[String] = Array("system")

  val Names: Seq[String] =
    Seq("compact", "vacuum", "vacuum_history", "restore", "history")

  def load(catalog: GraftCatalog, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Namespace) &&
      Names.contains(ident.name()),
      s"graft: unknown procedure $ident — available: " +
        Names.map(n => s"${catalog.name()}.system.$n").mkString(", "))
    new GraftProcedure(catalog, ident.name())
  }

  private def spark = SparkSession.active

  /** One row, rendered as an [[InternalRow]] (strings → UTF8String). */
  private def row(values: Any*): InternalRow =
    new GenericInternalRow(values.map {
      case s: String => UTF8String.fromString(s)
      case v => v
    }.toArray)

  private def result(schema: StructType, out: Seq[InternalRow])
      : java.util.Iterator[Scan] = {
    val outArray = out.toArray
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] = outArray
      override def readSchema(): StructType = schema
      override def description(): String = "GraftProcedureResult"
    }
    java.util.List.of(scan).iterator()
  }

  private[sources] final case class Spec(parameters: Seq[ProcedureParameter],
      outSchema: StructType,
      run: (GraftCatalog, InternalRow) => Seq[InternalRow])

  private def in(name: String, dt: DataType) =
    ProcedureParameter.in(name, dt).build()
  private def inDefault(name: String, dt: DataType, default: String) =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private[sources] def spec(name: String): Spec = name match {
    case "compact" => Spec(
      Seq(in("table", StringType),
        inDefault("small_file_bytes", LongType,
          (32L * 1024 * 1024).toString),
        // comma-separated cluster columns = OPTIMIZE ZORDER BY: packed
        // segments carry disjoint key ranges so stats pruning works
        // across them (empty = arrival-order packing)
        inDefault("cluster_by", StringType, "''")),
      StructType(Seq(StructField("version", IntegerType, nullable = false))),
      (cat, args) => {
        val cluster = Option(args.getUTF8String(2)).map(_.toString)
          .getOrElse("").split(",").map(_.trim).filter(_.nonEmpty)
          .toSeq.map(org.apache.spark.sql.functions.col)
        val v = ManagedTable.compact(spark, cat.resolveTableDir(
          args.getUTF8String(0).toString), args.getLong(1),
          clusterBy = cluster)
        Seq(row(v))
      })
    case "vacuum" => Spec(
      Seq(in("table", StringType),
        inDefault("retention_ms", LongType,
          ManagedTable.DefaultVacuumRetentionMs.toString)),
      StructType(Seq(
        StructField("swept_segments", IntegerType, nullable = false))),
      (cat, args) => {
        val swept = ManagedTable.vacuum(spark, cat.resolveTableDir(
          args.getUTF8String(0).toString), args.getLong(1))
        Seq(row(swept.size))
      })
    case "vacuum_history" => Spec(
      Seq(in("table", StringType),
        in("retain_versions", IntegerType),
        inDefault("retention_ms", LongType,
          ManagedTable.DefaultVacuumRetentionMs.toString)),
      StructType(Seq(
        StructField("dropped_versions", IntegerType, nullable = false),
        StructField("swept_segments", IntegerType, nullable = false),
        StructField("reclaimed_bytes", LongType, nullable = false))),
      (cat, args) => {
        val st = ManagedTable.vacuumHistory(spark, cat.resolveTableDir(
          args.getUTF8String(0).toString), args.getInt(1), args.getLong(2))
        Seq(row(st.droppedVersions.size, st.sweptSegments.size,
          st.reclaimedBytes))
      })
    case "restore" => Spec(
      Seq(in("table", StringType), in("version", IntegerType)),
      StructType(Seq(StructField("version", IntegerType, nullable = false))),
      (cat, args) => {
        val v = ManagedTable.restore(spark, cat.resolveTableDir(
          args.getUTF8String(0).toString), args.getInt(1))
        Seq(row(v))
      })
    case "history" => Spec(
      Seq(in("table", StringType)),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("tag", StringType, nullable = false),
        StructField("commit_ms", LongType, nullable = false),
        StructField("n_data_files", IntegerType, nullable = false),
        StructField("n_dv_files", IntegerType, nullable = false),
        StructField("n_columns", IntegerType, nullable = false))),
      (cat, args) => {
        ManagedTable.history(spark, cat.resolveTableDir(
          args.getUTF8String(0).toString))
          .collect() // |versions| rows — manifest metadata only
          .map(r => row(r.getInt(0), r.getString(1), r.getLong(2),
            r.getInt(3), r.getInt(4), r.getInt(5)))
          .toSeq
      })
  }

  private class GraftProcedure(catalog: GraftCatalog, procName: String)
      extends UnboundProcedure {
    override def name(): String = procName
    override def description(): String =
      s"graft maintenance procedure $procName"
    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        private val s = spec(procName)
        override def name(): String = procName
        override def description(): String =
          s"graft maintenance procedure $procName"
        override def parameters(): Array[ProcedureParameter] =
          s.parameters.toArray
        // side-effecting table maintenance: never constant-folded,
        // never re-executed speculatively
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] =
          result(s.outSchema, s.run(catalog, input))
      }
  }
}
