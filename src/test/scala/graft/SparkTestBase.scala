package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs. One session per suite keeps
  * `sbt -batch test` wall-clock sane. */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.session

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

object SparkTestBase {
  lazy val session: SparkSession = {
    // isolated per-run index root, deleted on JVM exit: test corpora
    // live in fresh temp dirs each run, so pointing the index lake at
    // the stable default would accumulate one never-superseded table
    // per run in /tmp
    val indexRoot = java.nio.file.Files.createTempDirectory("graft_test_index")
    sys.addShutdownHook { graft.lake.Lake.deleteRecursively(indexRoot) }
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.indexRoot", indexRoot.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
