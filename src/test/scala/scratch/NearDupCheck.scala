package scratch

import org.apache.spark.sql.SparkSession
import graft.ops.Similarity

/** Scratch check: the SRP-routed cosineNearDup must equal the exact
  * cross join on the driver's gate corpora (deterministic hyperplanes,
  * so a pass here is a pass in the gate). */
object NearDupCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val t0 = System.nanoTime()
      val lsh = Similarity.cosineNearDup(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val tLsh = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val exact = Similarity.cosineNearDupExact(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val tEx = (System.nanoTime() - t1) / 1e9
      println(f"NEARDUP $dir lsh=${lsh.size} (${tLsh}%.1fs) exact=${exact.size} (${tEx}%.1fs) " +
        s"missing=${(exact -- lsh).size} extra=${(lsh -- exact).size}")
    }
    spark.stop()
  }
}
