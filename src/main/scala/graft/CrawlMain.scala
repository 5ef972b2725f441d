package graft

import org.apache.spark.sql.SparkSession
import graft.core.SynthWeb
import graft.crawl.{CrawlConfig, Crawler}

/** CLI entry point — the engine's analog of the reference's `main`
  * (/root/reference/src/main.rs:27-41), driving the synthetic web.
  *
  * Usage:
  *   runMain graft.CrawlMain <lakeRoot> [--seeds N] [--hosts N]
  *     [--pages N] [--images N] [--links N] [--imgs-per-page N]
  *     [--depth N] [--hot F] [--robots] [--quota N] [--cpus N]
  *
  * Seeds are page 0 of the first `--seeds` hosts. Re-running with the
  * same lakeRoot RESUMES from the last committed wave (checkpointed
  * snapshots); a finished crawl is a no-op.
  */
object CrawlMain {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: CrawlMain <lakeRoot> [--seeds N] [--hosts N] ...")
      sys.exit(2)
    }
    val lakeRoot = args(0)
    // fold that consumes valueless flags (--robots) as single tokens
    // and key+value pairs otherwise, so flag position never shifts the
    // pairing of later options
    val valuelessFlags = Set("--robots")
    @scala.annotation.tailrec
    def parse(rest: List[String], acc: Map[String, String]): Map[String, String] = rest match {
      case Nil => acc
      case f :: tail if valuelessFlags(f) => parse(tail, acc + (f -> "true"))
      case k :: v :: tail if k.startsWith("--") => parse(tail, acc + (k -> v))
      case bad :: _ =>
        throw new IllegalArgumentException(s"unparseable option: $bad (missing value?)")
    }
    val opts = parse(args.drop(1).toList, Map.empty)

    def intOpt(k: String, d: Int) = opts.get(k).map(_.toInt).getOrElse(d)
    def dblOpt(k: String, d: Double) = opts.get(k).map(_.toDouble).getOrElse(d)

    val cpus = intOpt("--cpus", 4)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-crawl")
      .config("spark.sql.shuffle.partitions", math.max(8, cpus).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val web = SynthWeb.WebConfig(
      nHosts = intOpt("--hosts", 8),
      pagesPerHost = intOpt("--pages", 40),
      imagesPerHost = intOpt("--images", 20),
      linksPerPage = intOpt("--links", 8),
      imagesPerPage = intOpt("--imgs-per-page", 2),
      hotFrac = dblOpt("--hot", 0.0))
    val cfg = CrawlConfig(
      web = web,
      seeds = SynthWeb.seeds(intOpt("--seeds", 2)),
      lakeRoot = lakeRoot,
      depthLimit = intOpt("--depth", 4),
      robots = opts.contains("--robots"),
      perWaveHostQuota = opts.get("--quota").map(_.toInt),
      fetchPartitions = math.max(8, cpus * 2))

    val t0 = System.nanoTime()
    val summary = new Crawler(spark, cfg).run()
    val secs = (System.nanoTime() - t0) / 1e9
    val runLog = new graft.lake.RunLog(lakeRoot)
    val admitted = runLog.completeWaves.map(w => runLog.stats(w).getOrElse("admitted", 0L)).sum
    println(f"crawl done: waves=${summary.waves} seen=${summary.seenRows} " +
      f"images=${summary.imageRows} admitted=$admitted elapsed=$secs%.1fs " +
      f"throughput=${admitted / math.max(secs, 1e-9)}%.0f urls/s")
    spark.stop()
  }
}
