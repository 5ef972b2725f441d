package scratch

import org.apache.spark.sql.SparkSession
import graft.ops.Dedup

object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val t0 = System.nanoTime()
    val pairs = Dedup.ngramJaccard(spark, dir).select("a_id", "b_id")
    val pn = pairs.count()
    println(f"pairs rows=$pn ${(System.nanoTime() - t0) / 1e9}%.1fs")
    val tn = System.nanoTime()
    val nodes = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
    val df = Dedup.clusterLabels(nodes, pairs)
    val n = df.count()
    println(f"clusters rows=$n loop=${(System.nanoTime() - tn) / 1e9}%.1fs")
    val t1 = System.nanoTime()
    df.coalesce(1).write.mode("overwrite").parquet("/tmp/cluster_probe")
    println(f"write ${(System.nanoTime() - t1) / 1e9}%.1fs")
    spark.stop()
  }
}
