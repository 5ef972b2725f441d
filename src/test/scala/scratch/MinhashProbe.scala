package scratch

import org.apache.spark.sql.SparkSession
import graft.ops.Dedup

object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = Dedup.minhashNearDup(spark, dir).count()
      println(f"minhash run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
