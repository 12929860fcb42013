package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries, EventQueries, IndexQueries,
  LayoutQueries, MultimodalQueries, PosQueries, RelationalQueries,
  StreamingQueries, TextQueries, TrainingDataQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized by theme under [[graft.queries]]; each is a
  * [[NamedQuery]] pairing the Spark implementation with its DuckDB oracle
  * SQL (when ANSI-expressible). This object just flattens them.
  */
object SparkEntry {

  private def allQueries: Seq[NamedQuery] =
    RelationalQueries.all ++
      EventQueries.all ++
      TextQueries.all ++
      VectorQueries.all ++
      StreamingQueries.all ++
      MultimodalQueries.all ++
      PosQueries.all ++
      AnalyticsQueries.all ++
      TrainingDataQueries.all ++
      LayoutQueries.all ++
      IndexQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q04GoldCurrentInventory
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
