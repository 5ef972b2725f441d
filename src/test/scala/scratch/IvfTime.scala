package scratch

import org.apache.spark.sql.SparkSession
import graft.ops.Similarity

object IvfTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = Similarity.ivfTopK(spark, dir).count()
      println(f"IVF run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    val t1 = System.nanoTime()
    val np = Similarity.ivfPartitionedTopK(spark, dir).count()
    println(f"IVFPART rows=$np ${(System.nanoTime() - t1) / 1e9}%.1fs")
    spark.stop()
  }
}
