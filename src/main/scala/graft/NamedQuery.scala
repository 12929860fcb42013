package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle over the
  * same parquet tables. Column names/aliases MUST match between the two —
  * the driver sorts columns by name and hash-compares values.
  *
  * Determinism rules every query follows (see SURVEY.md §7.4):
  *   - explicit ORDER BY on a unique key in BOTH engines;
  *   - fp aggregates via exact DECIMAL(18,2) sums cast back to double;
  *   - ratios/cosines as floor(x*1e6) longs;
  *   - event timestamps as epoch-µs longs (`ts_us` ↔ `epoch_us(ts)`).
  */
final case class NamedQuery(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
