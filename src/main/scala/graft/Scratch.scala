package graft

/** Scratch directories for queries whose SUBJECT is table lifecycle
  * (the CDF/merge family): each query builds a small managed table
  * under /tmp, and deletes it up front so reruns are deterministic.
  *
  * Dirs are keyed by a per-JVM token so CONCURRENT runners (two sbt
  * JVMs, a bench racing a verify) cannot race on the same manifest
  * log — within one JVM the delete-at-start keeps reruns clean, and
  * the token costs nothing in determinism because no output column
  * ever contains a path.
  */
object Scratch {
  private val runToken: String =
    java.lang.Long.toHexString(
      java.util.UUID.randomUUID().getMostSignificantBits).take(8)

  /** `/tmp/graft-<family>-<jvm-token>/<sanitized sf dir>` */
  def dir(family: String, sfDir: String): String =
    s"/tmp/graft-$family-$runToken/" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")
}
