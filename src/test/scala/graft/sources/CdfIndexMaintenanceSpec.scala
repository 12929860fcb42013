package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Similarity

/** The q185 contract at row granularity: feeding a managed vector
  * table's change feed into incremental IVF assignment updates the
  * index rows for EXACTLY the touched keys — a deleteWhere retracts
  * precisely its predicate's postings, a replaceWhere moves precisely
  * its slice's postings, untouched keys keep their exact (id → cell)
  * row, and the incrementally-maintained index equals a full rebuild
  * of the new snapshot. This is what lets a 100 TB corpus backfill
  * update its ANN index at O(changeset) cost instead of re-scanning.
  */
class CdfIndexMaintenanceSpec extends SparkSpec {

  private def emb = graft.Tables.embeddings(spark, sf("sf0.001"))

  private def cent = emb.filter(col("vec_id") < 8)
    .select(col("vec_id").as("cid"), col("embedding").as("cv"))

  /** (vec_id → cell) for every row of `df(vec_id, embedding)`. */
  private def assign(df: DataFrame): Map[Long, Long] =
    Similarity.ivfAssign(
        df.select(col("vec_id").as("id"), col("embedding").as("v")), cent)
      .select("id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("deleteWhere + replaceWhere round-trips update exactly the touched index rows") {
    val dir = Files.createTempDirectory("graft-cdf-ivf").toString
    val base = emb.filter(col("vec_id") < 40).select("vec_id", "embedding")
    ManagedTable.commit(base.repartition(3), dir)
    val index1 = assign(ManagedTable.read(spark, dir))
    assert(index1.size == 40)

    // --- GDPR-style delete: vec_id % 10 == 3 ---
    ManagedTable.deleteWhere(spark, dir, col("vec_id") % 10 === 3)
    val cdf12 = ManagedTable.changes(spark, dir, 1, 2, Seq("vec_id"))
      .select("_change_type", "vec_id", "embedding").collect()
    val deletedKeys = cdf12.map(_.getLong(1)).toSet
    assert(cdf12.forall(_.getString(0) == "delete"),
      "a pure deleteWhere feed is deletes only")
    assert(deletedKeys == (0L until 40L).filter(_ % 10 == 3).toSet,
      "the feed names exactly the predicate's keys")
    // incremental: retract the fed keys, touch nothing else
    val index2 = index1 -- deletedKeys
    val rebuild2 = assign(ManagedTable.read(spark, dir))
    assert(index2 == rebuild2,
      "feed-retracted index must equal a full rebuild of v2")

    // --- backfill: vec_ids 4..9 get corrected (reversed) vectors ---
    val fixed = base.filter(col("vec_id").between(4, 9))
      .withColumn("embedding", reverse(col("embedding")))
    ManagedTable.replaceWhere(spark, dir,
      col("vec_id").between(4, 9), fixed, tag = "backfill")
    val cdf23 = ManagedTable.changes(spark, dir, 2, 3, Seq("vec_id"))
    val touched = cdf23.select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(touched == (4L to 9L).toSet,
      "the backfill feed names exactly the replaced slice")
    // incremental: retract preimages, add postimage assignments
    val post = assign(cdf23
      .filter(col("_change_type") === "update_postimage")
      .select("vec_id", "embedding"))
    assert(post.keySet == touched)
    val index3 = (index2 -- touched) ++ post
    val rebuild3 = assign(ManagedTable.read(spark, dir))
    assert(index3 == rebuild3,
      "feed-maintained index must equal a full rebuild of v3")
    // the exactly-touched-keys invariant: every surviving untouched key
    // kept its precise (id → cell) row through both round-trips
    (rebuild3.keySet -- touched).foreach { k =>
      assert(rebuild3(k) == index1(k),
        s"untouched key $k moved cells without appearing in any feed")
    }
  }
}
