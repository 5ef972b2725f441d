package scratch

import org.apache.spark.sql.SparkSession
import graft.core.SynthWeb
import graft.crawl.{CrawlConfig, Crawler, PartitionedBloom}

/** Scratch: track execution-memory pool usage across crawl waves to
  * find the leaking consumer. */
object MemProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def execMem: Long = {
      val mm = org.apache.spark.SparkEnv.get.memoryManager
      mm.executionMemoryUsed
    }
    def storMem: Long = org.apache.spark.SparkEnv.get.memoryManager.storageMemoryUsed

    // background poller: capture PEAK exec/storage between samples
    val peakExec = new java.util.concurrent.atomic.AtomicLong(0)
    val peakStor = new java.util.concurrent.atomic.AtomicLong(0)
    val poller = new Thread(() => {
      while (true) {
        peakExec.getAndUpdate(m => math.max(m, execMem))
        peakStor.getAndUpdate(m => math.max(m, storMem))
        Thread.sleep(100)
      }
    })
    poller.setDaemon(true)
    poller.start()

    val variant = if (args.nonEmpty) args(0) else "full"
    val cfg0 = CrawlConfig(
      web = SynthWeb.WebConfig(nHosts = 6, pagesPerHost = 25, imagesPerHost = 10,
        linksPerPage = 6, imagesPerPage = 2),
      seeds = SynthWeb.seeds(3),
      lakeRoot = java.nio.file.Files.createTempDirectory("memlake").toString,
      fetchPartitions = 8, saltSlots = 2)
    val cfg = variant match {
      case "nobloom"  => cfg0.copy(bloom = false)
      case "noprelim" => cfg0.copy(admitPreLimit = false)
      case "b8"       => cfg0.copy(seenBuckets = 8)
      case _           => cfg0
    }
    println(s"VARIANT $variant")
    (0 until 4).foreach { i =>
      val c = new Crawler(spark, cfg.copy(lakeRoot =
        java.nio.file.Files.createTempDirectory(s"memlake$i").toString))
      c.initRun()
      val bloom = new PartitionedBloom(cfg.seenBuckets, cfg.bloomExpectedItems, cfg.bloomFpp)
      var wave = 0
      var n = 1L
      while (n > 0 && wave < 20) {
        n = c.runWave(wave, bloom)
        println(f"MEM crawl$i wave$wave exec=${execMem / 1024}%dKB stor=${storMem / 1024}%dKB " +
          f"peakExec=${peakExec.getAndSet(0) / 1024}%dKB peakStor=${peakStor.getAndSet(0) / 1024}%dKB")
        wave += 1
      }
      c.awaitQuiesce()
      println(f"MEM crawl$i END exec=${execMem / 1024}%dKB stor=${storMem / 1024}%dKB")
    }
    spark.stop()
  }
}
