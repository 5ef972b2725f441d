package graft.crawl

import graft.SparkTestBase
import graft.core.{Imaging, SynthWeb}

/** Per-row image conformance (BASELINE.json input_hint): decode
  * engine-fetched bytes and compare with the oracle corpus — PNG exact
  * pixels, JPEG decoded-pixel PSNR >= 40 dB, caption exact equality,
  * phash equality (phash is computed from decoded bytes in both). */
class ImagesSpec extends SparkTestBase {

  test("images table rows conform: pixels, caption, phash, dims") {
    val web = SynthWeb.WebConfig(nHosts = 3, pagesPerHost = 12, imagesPerHost = 8,
      imagesPerPage = 2, jpegFrac = 0.5)
    val crawler = new Crawler(spark, CrawlConfig(
      web = web, seeds = SynthWeb.seeds(2), lakeRoot = tmpDir("imglake"),
      fetchPartitions = 8, saltSlots = 2))
    crawler.run()

    val rows = crawler.imagesT.readAll()
      .select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getString(4) == "png") && rows.exists(_.getString(4) == "jpeg"))

    rows.foreach { r =>
      val id = r.getString(0)
      val bytes = r.getAs[Array[Byte]](1)
      val (w, h, fmt, caption, phash) =
        (r.getInt(2), r.getInt(3), r.getString(4), r.getString(5), r.getLong(6))

      // oracle corpus: regenerate the source pixels for this id
      val oracle = Imaging.synthPixels(id, w, h)
      val (ow, oh) = SynthWeb.imageDims(id)
      assert((ow, oh) == (w, h), s"$id dims")

      val decoded = Imaging.decode(bytes)
      assert(decoded.getWidth == w && decoded.getHeight == h)
      if (fmt == "png") {
        assert(Imaging.exactPixels(decoded, oracle), s"$id png not pixel-exact")
      } else {
        val p = Imaging.psnr(oracle, decoded)
        assert(p >= 40.0, s"$id jpeg psnr=$p")
      }
      assert(caption == SynthWeb.caption(id), s"$id caption")
      assert(phash == Imaging.aHash(decoded), s"$id phash vs decoded")
      // and the decoded-phash stays adjacent to the source-pixel phash
      assert(Imaging.hamming(phash, Imaging.aHash(oracle)) <= 4, s"$id phash drift")
    }
  }
}
