package graft.crawl

import graft.SparkTestBase
import graft.core.{RefSim, SynthWeb}

/** SURVEY.md §5.6: interrupt the loop after an intermediate wave's
  * commit, restart, and assert the final state is identical to an
  * uninterrupted run (and to the oracle). */
class ResumeSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  test("kill after wave k, resume, final state identical") {
    val web = SynthWeb.WebConfig(nHosts = 4, pagesPerHost = 20, imagesPerHost = 8)
    val seeds = SynthWeb.seeds(2)
    def cfg(root: String) = CrawlConfig(web = web, seeds = seeds, lakeRoot = root,
      fetchPartitions = 8, saltSlots = 2)

    // uninterrupted reference run
    val fullRoot = tmpDir("full")
    val fullSummary = new Crawler(spark, cfg(fullRoot)).run()

    // interrupted run: execute only waves 0..1 then "crash"
    val root = tmpDir("resume")
    val c1 = new Crawler(spark, cfg(root))
    c1.initRun()
    val c = cfg(root)
    val bloom1 = new PartitionedBloom(c.seenBuckets, c.bloomExpectedItems, c.bloomFpp)
    c1.runWave(0, bloom1)
    c1.runWave(1, bloom1)
    c1.awaitQuiesce() // join async metrics so the two writers don't race in-JVM
    // a later, uncommitted wave's partial data would be overwritten on
    // resume; simulate one by dropping junk into the data dir
    val junk = java.nio.file.Paths.get(root, "frontier", "data", "wave=99")
    java.nio.file.Files.createDirectories(junk)

    // restart from scratch object state (fresh crawler, fresh bloom)
    val c2 = new Crawler(spark, cfg(root))
    val resumedSummary = c2.run()

    assert(resumedSummary.seenRows == fullSummary.seenRows)
    assert(resumedSummary.imageRows == fullSummary.imageRows)
    assert(resumedSummary.waves == fullSummary.waves)

    val a = c2.seenT.readAll().select("kind", "url", "depth").collect().toSet
    val b = new Crawler(spark, cfg(fullRoot)).seenT.readAll()
      .select("kind", "url", "depth").collect().toSet
    assert(a == b)

    // and both equal the oracle
    val sim = RefSim.run(seeds, web)
    assert(a.map(r => (r.getString(0), r.getString(1), r.getInt(2))) ==
      sim.seen.map(f => (f.kind, f.url, f.depth)))
  }
}
