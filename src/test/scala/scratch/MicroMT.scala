import graft.core._
object MicroMT {
  def bench(name: String, threads: Int, n: Int)(f: Int => Unit): Unit = {
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      new Thread(() => { var i = t; while (i < n) { f(i); i += threads } })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    val sec = (System.nanoTime()-t0)/1e9
    println(f"$name%-28s threads=$threads%2d  ${n/sec}%8.0f ops/s")
  }
  def main(a: Array[String]): Unit = {
    val ids = (0 until 512).map(i => s"http://h1.test/img/a$i.png")
    // warmup
    ids.take(64).foreach { id => val im = Imaging.synthPixels(id, 96, 96); Imaging.decode(Imaging.encodePng(im)) }
    for (t <- Seq(1, 8, 32)) {
      bench("synthPixels96", t, 512)(i => Imaging.synthPixels(ids(i), 96, 96))
    }
    val imgs = ids.map(id => Imaging.synthPixels(id, 96, 96)).toArray
    for (t <- Seq(1, 8, 32)) bench("encodePng96", t, 512)(i => Imaging.encodePng(imgs(i)))
    for (t <- Seq(1, 8, 32)) bench("encodeJpeg96", t, 512)(i => Imaging.encodeJpeg(imgs(i)))
    val pngs = imgs.map(Imaging.encodePng)
    for (t <- Seq(1, 8, 32)) bench("decode+aHash", t, 512)(i => Imaging.aHash(Imaging.decode(pngs(i))))
    val cfg = SynthWeb.WebConfig(nHosts=1600, pagesPerHost=400, imagesPerHost=200, imgMinDim=64, imgMaxDim=128)
    for (t <- Seq(1, 8, 32)) bench("fetchImage", t, 512)(i => SynthWeb.fetch(s"http://h2.test/img/a${i%200}.jpg", cfg))
    for (t <- Seq(1, 8, 32)) bench("fetchPage+parse", t, 2048)(i => {
      SynthWeb.fetch(s"http://h3.test/p${i%400}", cfg) match {
        case SynthWeb.PageBody(h) => RefSim.processPage(s"http://h3.test/p${i%400}", h, 0)
        case _ => ()
      }})
  }
}
