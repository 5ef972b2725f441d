package graft.crawl

import graft.SparkTestBase
import graft.core.{RefSim, SynthWeb}

/** S6 — the per-wave, per-host-bucket metrics table (the north rule's
  * "per-partition lineage + metrics"). Until round 3 it was only
  * exercised indirectly through RunLog stats; here its per-wave sums
  * are asserted ≡ RefSim's independently-maintained counters, on a
  * normal corpus and on a binding-budget corpus (budget_dropped > 0).
  */
class MetricsSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  private def metricSums(crawler: Crawler): Map[Int, Map[String, Long]] = {
    val cols = Seq("candidates", "admitted", "fetch_ok", "fetch_err",
      "novel", "dup_dropped", "images_written", "budget_dropped")
    crawler.metricsT.readAll()
      .groupBy(col("wave"))
      .agg(sum(cols.head).as(cols.head), cols.tail.map(c => sum(c).as(c)): _*)
      .collect()
      .map { r =>
        r.getAs[Int]("wave") -> cols.map(c => c -> r.getAs[Long](c)).toMap
      }
      .toMap
  }

  private def assertMetricsConform(cfg: SynthWeb.WebConfig, seeds: Seq[String],
                                   hostVisitLimit: Int = 256): Crawler = {
    val sim = RefSim.run(seeds, cfg, hostVisitLimit = hostVisitLimit)
    val crawler = new Crawler(spark, CrawlConfig(
      web = cfg, seeds = seeds, lakeRoot = tmpDir("metrics_lake"),
      hostVisitLimit = hostVisitLimit,
      fetchPartitions = 8, saltSlots = 2, admitPreLimitMinRows = 0L))
    crawler.run()
    val eng = metricSums(crawler)
    assert(eng.keySet == sim.waveStats.indices.toSet,
      s"metric waves ${eng.keySet.toSeq.sorted} vs sim ${sim.waveStats.indices}")
    sim.waveStats.zipWithIndex.foreach { case (ws, k) =>
      val m = eng(k)
      assert(m("candidates") == ws.candidates, s"wave $k candidates: ${m("candidates")} vs ${ws.candidates}")
      assert(m("admitted") == ws.admitted, s"wave $k admitted: ${m("admitted")} vs ${ws.admitted}")
      assert(m("fetch_ok") == ws.fetchOk, s"wave $k fetch_ok: ${m("fetch_ok")} vs ${ws.fetchOk}")
      assert(m("fetch_err") == ws.fetchErr, s"wave $k fetch_err: ${m("fetch_err")} vs ${ws.fetchErr}")
      assert(m("novel") == ws.novel, s"wave $k novel: ${m("novel")} vs ${ws.novel}")
      assert(m("dup_dropped") == ws.dupDropped, s"wave $k dup_dropped: ${m("dup_dropped")} vs ${ws.dupDropped}")
      assert(m("images_written") == ws.imagesWritten, s"wave $k images: ${m("images_written")} vs ${ws.imagesWritten}")
      assert(m("budget_dropped") == ws.candidates - ws.admitted,
        s"wave $k budget_dropped: ${m("budget_dropped")} vs ${ws.candidates - ws.admitted}")
    }
    crawler
  }

  test("metrics table sums equal RefSim per-wave counters") {
    assertMetricsConform(
      SynthWeb.WebConfig(nHosts = 6, pagesPerHost = 25, imagesPerHost = 10),
      SynthWeb.seeds(3))
  }

  test("metrics under a binding budget: budget_dropped matches and is non-zero") {
    // dense link graph + tiny budget => admission cap binds hard
    val crawler = assertMetricsConform(
      SynthWeb.WebConfig(nHosts = 4, pagesPerHost = 30, imagesPerHost = 8,
        linksPerPage = 12),
      SynthWeb.seeds(4), hostVisitLimit = 10)
    val dropped = metricSums(crawler).values.map(_("budget_dropped")).sum
    assert(dropped > 0, "expected the 11-cap to drop candidates")
  }

  test("metrics under redirects: fetch errors (redirect loops) are counted") {
    val crawler = assertMetricsConform(
      SynthWeb.WebConfig(nHosts = 5, pagesPerHost = 20, imagesPerHost = 6,
        redirectFrac = 0.3),
      SynthWeb.seeds(3))
    val errs = metricSums(crawler).values.map(_("fetch_err")).sum
    assert(errs > 0, "redirect corpus should produce some too-many-redirect drops")
  }
}
