package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField,
  StructType}

/** LOGICAL → PHYSICAL column mapping — what makes `ALTER TABLE …
  * RENAME COLUMN` and `DROP COLUMN` METADATA-ONLY operations on a
  * table of any size (Delta's column mapping, name mode, re-expressed
  * over the manifest log; reference anchor: the schema authority of
  * the DLT tables, notebooks/03_Data_Ingestion.py:59-64).
  *
  * The manifest schema is the single source of truth: each field MAY
  * carry a `graft.physical` metadata entry naming the column as it
  * appears in the parquet segments. Absent metadata means physical ==
  * logical — the state of every table until its first rename (or a
  * post-drop re-add), so unmapped tables pay zero translation cost on
  * any path.
  *
  *   - **RENAME**: the field keeps its physical name (already baked
  *     into committed segments) and only the logical name changes —
  *     one manifest write, zero data bytes. Renaming back to the
  *     physical name drops the mapping again.
  *   - **DROP**: the field leaves the schema; its bytes stay in the
  *     segments, unread (exactly Delta's drop semantics — `VACUUM`
  *     of history ages the bytes out with their manifests). The
  *     dropped PHYSICAL name is recorded in the manifest's retired
  *     ledger (see [[ManagedTable.TableStatsFile]]) so a later ADD of
  *     the same logical name maps to a FRESH physical name instead of
  *     resurrecting the dead column's data.
  *   - **ADD**: identity physical unless it would collide with a
  *     current physical/logical name or a retired physical — then a
  *     version-stamped name (`name__v<N>`), which no committed
  *     segment can contain.
  *
  * Translation points: parquet-facing reads use [[physSchema]] (or
  * [[physicalFor]] for a pruned subset), parquet-facing writes use
  * [[toPhysicalFrame]], stats lookups key on [[physOf]], and
  * user-facing schemas pass through [[strip]]. Per-file min/max stats
  * are keyed by PHYSICAL name (they are computed from the written
  * segment, whose columns are physical), so stats written before a
  * rename keep pruning after it.
  */
private[graft] object ColumnMapping {
  /** StructField metadata key holding the parquet-side column name. */
  val PhysKey = "graft.physical"

  def phys(f: StructField): String =
    if (f.metadata.contains(PhysKey)) f.metadata.getString(PhysKey)
    else f.name

  def isMapped(s: StructType): Boolean =
    s.fields.exists(_.metadata.contains(PhysKey))

  /** Physical name of `logical` under `s` — identity for names not in
    * the schema (metadata columns like `_file`, DV bookkeeping).
    */
  def physOf(s: StructType, logical: String): String =
    s.fields.find(_.name == logical).map(phys).getOrElse(logical)

  /** The schema as the parquet segments see it: logical positions and
    * types, PHYSICAL names, mapping metadata dropped. Identity (same
    * instance) for unmapped schemas.
    */
  def physSchema(s: StructType): StructType =
    if (!isMapped(s)) s
    else StructType(s.fields.map(f =>
      f.copy(name = phys(f), metadata = withoutKey(f.metadata))))

  /** A pruned read schema translated to physical names — field order
    * and types untouched (decoded rows are positional). Names outside
    * `table` (the `_file` metadata column) pass through unchanged.
    */
  def physicalFor(required: StructType, table: StructType): StructType =
    if (!isMapped(table)) required
    else StructType(required.fields.map(f =>
      f.copy(name = physOf(table, f.name),
        metadata = withoutKey(f.metadata))))

  /** User-facing view of a manifest schema: mapping metadata removed
    * (it is storage bookkeeping, not data semantics). Identity for
    * unmapped schemas.
    */
  def strip(s: StructType): StructType =
    if (!isMapped(s)) s
    else StructType(s.fields.map { f =>
      if (!f.metadata.contains(PhysKey)) f
      else f.copy(metadata = withoutKey(f.metadata))
    })

  private def withoutKey(m: Metadata): Metadata =
    if (!m.contains(PhysKey)) m
    else {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = om.readTree(m.json)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      node.remove(PhysKey)
      Metadata.fromJson(om.writeValueAsString(node))
    }

  /** `f` mapped to `physical` — identity mapping is stored as NO
    * metadata (so renaming a column back to its physical name fully
    * un-maps it).
    */
  def withPhys(f: StructField, physical: String): StructField =
    if (physical == f.name) f.copy(metadata = withoutKey(f.metadata))
    else f.copy(metadata = new MetadataBuilder()
      .withMetadata(withoutKey(f.metadata))
      .putString(PhysKey, physical).build())

  /** A logical-named frame re-projected to `table`'s physical names in
    * `table` field order — the step before any segment write. Identity
    * projection skip for unmapped tables.
    */
  def toPhysicalFrame(df: DataFrame, table: StructType): DataFrame = {
    import org.apache.spark.sql.functions.col
    if (!isMapped(table)) df
    else df.select(table.fields.map(f => col(f.name).as(phys(f))).toSeq: _*)
  }

  /** Physical name for a NEW column: identity unless taken or retired,
    * else version-stamped (`name__v<next>`, uniquified) — a name no
    * committed segment can contain, so old files null-fill it.
    */
  def assignPhys(name: String, taken: Set[String], retired: Set[String],
      next: Int): String =
    if (!taken(name) && !retired(name)) name
    else {
      var cand = s"${name}__v$next"
      var i = 0
      while (taken(cand) || retired(cand)) {
        i += 1; cand = s"${name}__v${next}_$i"
      }
      cand
    }

  /** The mapped form of an evolved schema: surviving fields keep the
    * MANIFEST's metadata (the manifest is the mapping authority, never
    * the caller's copy), new fields get [[assignPhys]]'d physical
    * names checked against every current physical, every other logical
    * name, and the retired ledger.
    */
  def evolve(old: StructType, wanted: StructType, retired: Set[String],
      next: Int): StructType = {
    val oldPhys = old.fields.map(phys).toSet
    val allLogical = wanted.fields.map(_.name).toSet
    var assigned = Set.empty[String]
    StructType(wanted.fields.map { f =>
      old.fields.find(_.name == f.name) match {
        case Some(of) => f.copy(metadata = of.metadata)
        case None =>
          val taken = oldPhys ++ (allLogical - f.name) ++ assigned
          val p = assignPhys(f.name, taken, retired, next)
          assigned += p
          withPhys(f, p)
      }
    })
  }
}
