package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession per suite (UTC, small shuffle width). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName(getClass.getSimpleName)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.QuietLogs() // deliberate BoundedWindow sites must not flood logs
    s
  }

  def sf(name: String): String = s"/root/testdata/$name"

  /** Test-owned checkpoint dir, under a root SEPARATE from the
    * `/tmp/graft-ckpt` that Verify/Bench sweep at startup — a
    * concurrently running Verify must never delete a live test
    * checkpoint out from under a streaming query (observed once as a
    * "commits does not exist" STREAM_FAILED flake). The test root is
    * swept once per JVM instead.
    */
  def ckptDir(name: String): String =
    s"${SparkSpec.ckptRoot}/$name-${System.nanoTime()}"
}

object SparkSpec {
  lazy val ckptRoot: String = {
    val root = "/tmp/graft-ckpt-test"
    val dir = new java.io.File(root)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    if (dir.exists()) rm(dir)
    root
  }
}
