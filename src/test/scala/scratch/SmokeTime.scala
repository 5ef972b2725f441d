package scratch

/** Measurement probe for the q_crawl_smoke / crawl_hot fixed-cost
  * story (VERDICT r2 "What's wrong" #1). Times the exact driver-bench
  * smoke query and (optionally) the hot-host run in a fresh local[32]
  * session, printing per-wave section timings when GRAFT_WAVE_TIMING=1.
  */
object SmokeTime {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session(32)
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"TIMED $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // warm the session like the sweep does (a couple of parquet queries)
    graft.ops.Relational.q1Agg(spark, "/root/testdata/sf0.01").count()
    (1 to args.headOption.map(_.toInt).getOrElse(2)).foreach { i =>
      time(s"q_crawl_smoke_$i") {
        graft.SparkEntry.queries("q_crawl_smoke")(spark, "/root/testdata/sf0.01").count()
      }
    }
    if (sys.env.contains("GRAFT_SMOKE_HOT")) {
      time("crawl_hot") {
        val lake = java.nio.file.Files.createTempDirectory("hot_probe").toString
        val cfg = graft.crawl.CrawlConfig(
          web = graft.core.SynthWeb.WebConfig(nHosts = 300, pagesPerHost = 400,
            imagesPerHost = 4, linksPerPage = 30, imagesPerPage = 0, hotFrac = 0.85,
            malformedFrac = 0.0, imgMinDim = 16, imgMaxDim = 32),
          seeds = graft.core.SynthWeb.seeds(300), lakeRoot = lake,
          fetchPartitions = 128)
        new graft.crawl.Crawler(spark, cfg).run()
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(lake)).iterator().asScala
          .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    spark.stop()
  }
}
