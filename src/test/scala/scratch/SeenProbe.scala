package scratch
object SeenProbe {
  def main(args: Array[String]): Unit = {
    import graft.core.{RefSim, SynthWeb}
    for {
      hosts <- Seq(16, 24, 32)
      pages <- Seq(100, 150)
    } {
      val cfg = SynthWeb.WebConfig(nHosts = hosts, pagesPerHost = pages,
        imagesPerHost = pages / 2, linksPerPage = 12, imagesPerPage = 3)
      val sim = RefSim.run(SynthWeb.seeds(hosts / 2), cfg)
      println(s"hosts=$hosts pages=$pages -> waves=${sim.frontiers.length} seen=${sim.seen.size} admitted=${sim.admissions.size}")
    }
  }
}
