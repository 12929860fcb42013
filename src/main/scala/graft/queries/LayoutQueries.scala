package graft.queries

import org.apache.spark.sql.functions._
import graft.{NamedQuery, Tables}
import graft.functions.TextFunctions.tokens

/** Data-layout management: the write side of the 100-TB contract. A
  * corpus that will be read thousands of times must be WRITTEN so reads
  * prune — hive-partitioned by the dominant filter column, sorted within
  * partitions so parquet zone maps (min/max stats) skip row groups on
  * the secondary key. PlanGuardsSpec proves the pruning (PartitionFilters
  * + numFiles); the query here makes the layout operator itself a
  * first-class, hash-checked inventory item: values must survive the
  * write→read round trip bit-exactly.
  */
object LayoutQueries {

  /** Deterministic scratch dir per input dataset (sf dirs differ). */
  private def layoutDir(d: String): String =
    "/tmp/graft-layout/" + d.replaceAll("[^A-Za-z0-9.]", "_")

  /** q67: write documents hive-partitioned by `lang` (the dominant
    * filter column: splits, per-language sampling, contamination checks
    * all filter on it), sorted within partitions by `doc_id` for
    * zone-map locality, then read back with a partition filter and
    * aggregate. The read lists only the en/de directories — the scan
    * never touches the other languages' files — and the aggregate must
    * reproduce the source values exactly, proving the layout op is
    * lossless. At 100 TB this is the difference between scanning the
    * whole corpus and scanning 2/|langs| of it on every downstream read.
    */
  val q67PartitionedLayout = NamedQuery(
    "q67_partitioned_layout",
    "Hive-partitioned write of documents by lang (sorted by doc_id " +
      "within partitions), partition-pruned read back of en+de, " +
      "per-lang doc counts and exact token sums.",
    (s, d) => {
      val out = layoutDir(d)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
        // lang FIRST: the partitionBy(lang) writer requires ordering on
        // the partition column — with doc_id alone it injects its own
        // lang-only sort and the doc_id order is discarded; with the
        // required column as prefix this sort is used as-is and doc_id
        // order survives into the row groups (the zone-map contract)
        .sortWithinPartitions("lang", "doc_id")
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      s.read.parquet(out)
        .filter(col("lang").isin("en", "de"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(len(string_split(lower(text),' '))) AS BIGINT)
           |    AS sum_tokens
           |FROM documents WHERE lang IN ('en','de')
           |GROUP BY lang ORDER BY lang""".stripMargin))

  val all: Seq[NamedQuery] = Seq(q67PartitionedLayout)
}
