package scratch

/** Measures IVF ANN recall vs the exact brute-force top-k on a driver
  * corpus — the quality side of the Lloyd-centroid change (speed is
  * the sweep's job). Run: sbt "Test/runMain scratch.RecallProbe". */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.Bench.session(8)
    try {
      val brute = graft.ops.Similarity.bruteTopK(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivf = graft.ops.Similarity.ivfTopK(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"RECALL ${(brute & ivf).size.toDouble / brute.size}%.4f " +
        s"(${(brute & ivf).size}/${brute.size})")
    } finally spark.stop()
  }
}
