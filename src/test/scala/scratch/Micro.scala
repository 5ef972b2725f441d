import graft.core._
object Micro {
  def time(name: String, n: Int)(f: Int => Unit): Unit = {
    val t0 = System.nanoTime()
    var i = 0; while (i < n) { f(i); i += 1 }
    println(f"$name%-22s ${(System.nanoTime()-t0)/1e3/n}%10.1f us/op")
  }
  def main(a: Array[String]): Unit = {
    val cfg = SynthWeb.WebConfig(nHosts=2000, pagesPerHost=400, imagesPerHost=100, linksPerPage=12, imagesPerPage=2)
    // warmup
    (0 until 200).foreach { i => SynthWeb.fetch(SynthWeb.pageUrl(i % 100, i % 50), cfg) }
    time("pageHtml", 2000)(i => SynthWeb.pageHtml(i % 100, i % 300, cfg))
    time("fetch(page)", 2000)(i => SynthWeb.fetch(SynthWeb.pageUrl(i % 100, i % 300), cfg))
    val html = SynthWeb.pageHtml(3, 7, cfg)
    time("processPage", 2000)(i => RefSim.processPage(SynthWeb.pageUrl(3, 7), html, 0))
    time("synthPixels40", 500)(i => Imaging.synthPixels(s"http://h1.test/img/a$i.png", 40, 40))
    val img = Imaging.synthPixels("x", 40, 40)
    time("encodePng", 500)(_ => Imaging.encodePng(img))
    time("encodeJpeg", 500)(_ => Imaging.encodeJpeg(img))
    val png = Imaging.encodePng(img); val jpg = Imaging.encodeJpeg(img)
    time("decode(png)+aHash", 500)(_ => Imaging.aHash(Imaging.decode(png)))
    time("decode(jpg)+aHash", 500)(_ => Imaging.aHash(Imaging.decode(jpg)))
    time("fetch(image png)", 300)(i => SynthWeb.fetch(s"http://h1.test/img/a${i%100}.png", cfg))
    time("fetch(image jpg)", 300)(i => SynthWeb.fetch(s"http://h1.test/img/a${i%100}.jpg", cfg))
    time("caption", 2000)(i => SynthWeb.caption(s"http://h1.test/img/a$i.png"))
  }
}
