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

  // best-effort hygiene: per-JVM tokens mean each run leaves its
  // scratch roots behind; prune ONLY dirs matching this object's exact
  // naming scheme (graft-<family>-<8 hex>) that have been idle for a
  // day — a concurrent runner's live dirs are hours old at most
  locally {
    val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
    val pat = "^graft-[a-z0-9]+-[0-9a-f]{8}$".r
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    try Option(new java.io.File("/tmp").listFiles()).foreach(_.foreach {
      d =>
        if (d.isDirectory && pat.matches(d.getName) &&
          d.lastModified() < cutoff) rm(d)
    })
    catch { case _: Throwable => () }
  }

  /** `/tmp/graft-<family>-<jvm-token>/<sanitized sf dir>` */
  def dir(family: String, sfDir: String): String =
    s"/tmp/graft-$family-$runToken/" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")
}
