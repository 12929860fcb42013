package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** Marker for window specs over frames KNOWN to be bounded
  * (post-`limit` rank windows, per-source water-fill tables, replicate
  * grids): a deliberate single-partition window over ≤ tens of rows.
  *
  * WindowExec logs "No Partition Defined … serious performance
  * degradation" for every such window — correct advice for data-scaled
  * frames, pure noise for these (at ~dozens of deliberate tiny windows
  * per bench run it buries any real warning). Spark 4's
  * `EliminateWindowPartitions` rule folds constant partition keys
  * right back out of the plan, so the warning cannot be silenced at
  * the plan level; the harness entrypoints (Bench/Verify/SparkSpec)
  * instead raise that ONE logger to ERROR via [[QuietLogs]]. This
  * object keeps the intent greppable at the call site: every use
  * asserts "this frame is bounded by construction".
  *
  * Do NOT use this for data-scaled frames; an unbounded global window
  * SHOULD warn (and stay un-suppressed in library code paths).
  */
object BoundedWindow {
  def orderBy(cols: Column*): WindowSpec = Window.orderBy(cols: _*)
}

/** Targeted log hygiene for the harness entrypoints: every
  * [[BoundedWindow]] site is a deliberate ≤tens-of-rows single-
  * partition window, so WindowExec's per-execution warning is noise
  * that floods bench/test logs (~dozens per run) and buries real
  * warnings. Raise exactly that logger to ERROR; everything else
  * keeps warning.
  */
object QuietLogs {
  def apply(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
}
