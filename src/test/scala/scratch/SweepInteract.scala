package scratch

import org.apache.spark.sql.SparkSession
import graft.ops.Dedup

object SweepInteract {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag rows=$n ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    time("clusters1")(Dedup.dedupClusters(spark, dir).count())
    time("clusters2")(Dedup.dedupClusters(spark, dir).count())
    time("minhash1")(Dedup.minhashNearDup(spark, dir).count())
    time("minhash2")(Dedup.minhashNearDup(spark, dir).count())
    spark.catalog.clearCache()
    time("minhash3-clearedcache")(Dedup.minhashNearDup(spark, dir).count())
    time("minhash4")(Dedup.minhashNearDup(spark, dir).count())
    spark.stop()
  }
}
