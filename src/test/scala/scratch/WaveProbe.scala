package scratch

/** Finds corpora with many small waves for WaveStressSpec. */
object WaveProbe {
  def main(args: Array[String]): Unit = {
    import graft.core.{RefSim, SynthWeb}
    for {
      hosts <- Seq(2, 3, 4)
      pages <- Seq(30, 60)
      links <- Seq(1, 2)
    } {
      val cfg = SynthWeb.WebConfig(nHosts = hosts, pagesPerHost = pages,
        imagesPerHost = 5, linksPerPage = links, imagesPerPage = 1)
      val sim = RefSim.run(SynthWeb.seeds(1), cfg)
      println(s"hosts=$hosts pages=$pages links=$links -> waves=${sim.frontiers.length} " +
        s"seen=${sim.seen.size} maxFrontier=${sim.frontiers.map(_.size).max}")
    }
  }
}
