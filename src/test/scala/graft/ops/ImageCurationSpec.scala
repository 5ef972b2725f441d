package graft.ops

import graft.SparkTestBase
import graft.core.Imaging

/** Image dedup + the image-quality gate: planted corpora make every
  * rule bind (the vacuous-oracle trap — a natural corpus has no byte
  * duplicates and few gate failures), and the stats feeding the gate
  * are decode-true (recomputed here straight from the bytes). */
class ImageCurationSpec extends SparkTestBase {

  test("exact image dedup: planted byte-dups collapse to the min-id keeper") {
    // n=64, distinct=48: content ids 0..15 appear twice, 16..47 once
    val rows = Multimodal.imageDedup(spark).collect()
    assert(rows.length == 64)
    val groups = rows.groupBy(_.getString(1)) // content_hash
    assert(groups.size == 48, s"distinct hashes=${groups.size}")
    assert(groups.values.count(_.length == 2) == 16, "planted dup pairs missing")
    assert(groups.values.count(_.length == 1) == 32)
    groups.values.foreach { g =>
      val keepers = g.filter(_.getBoolean(3))
      assert(keepers.length == 1, "exactly one keeper per content group")
      assert(keepers.head.getString(0) == g.map(_.getString(0)).min,
        "keeper must be the lexicographic-min image_id")
      g.foreach(r => assert(r.getLong(2) == g.length, "n_copies"))
    }
  }

  test("image stats are decode-true: exact recompute from the bytes") {
    val stats = Multimodal.imageStatsAux(spark).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getInt(2), r.getLong(4))).toMap
    val imgs = Multimodal.curationImages(spark, 64).collect()
    assert(stats.size == 64 && imgs.length == 64)
    imgs.foreach { r =>
      val id = r.getString(0)
      val img = Imaging.decode(r.getAs[Array[Byte]](1))
      var lum = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = img.getRGB(x, y)
        lum += ((p >> 16) & 0xff) * 299L + ((p >> 8) & 0xff) * 587L + (p & 0xff) * 114L
      }
      val (w, h, lumKilo) = stats(id)
      assert(w == img.getWidth && h == img.getHeight, id)
      assert(lumKilo == lum, s"$id lum")
    }
  }

  test("video static detection: planted stills flagged, animated videos pass") {
    val rows = Multimodal.videoStatic(spark).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(rows.size == 48)
    rows.foreach { case (id, (nSampled, nPairs, nStatic, isStatic)) =>
      val i = id.stripPrefix("curvid").stripSuffix(".gif").toLong
      // 12 frames at stride 4 -> 3 sampled, 2 consecutive pairs
      assert(nSampled == 3L && nPairs == 2L, s"$id sampled=$nSampled pairs=$nPairs")
      if (i % 5 == 0) {
        assert(isStatic && nStatic == 2L, s"planted still $id not flagged")
      } else {
        assert(!isStatic, s"animated $id misflagged static (n_static=$nStatic)")
      }
    }
  }

  test("image quality gate: every rule binds on the planted corpus") {
    val rows = Multimodal.imageQuality(spark).collect()
    assert(rows.length == 64)
    def b(r: org.apache.spark.sql.Row, i: Int) = r.getBoolean(i)
    // keep is exactly the conjunction (same rows the oracle replays)
    rows.foreach(r => assert(b(r, 6) == (b(r, 3) && b(r, 4) && b(r, 5))))
    // the tiny plant fails dims while passing aspect (12x12 is square)
    assert(rows.exists(r => !b(r, 3) && b(r, 4)), "dims rule never bound alone")
    // the 78x24 banner passes dims but fails aspect (78 > 3*24)
    assert(rows.exists(r => b(r, 3) && !b(r, 4)), "aspect rule never bound alone")
    // the darkened plant (>>3 per channel) drops mean luminance < 30
    assert(rows.exists(r => !b(r, 5)), "luminance rule never bound")
    // and the gate is not a rejection machine: most images survive
    assert(rows.count(_.getBoolean(6)) >= 16, "too few keepers")
  }
}
