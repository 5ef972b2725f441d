package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.XxHash64

/** Similarity search over the `embeddings` table (Array[Float],
  * 64-dim): brute-force cosine top-k as the exact baseline, and a
  * signed-random-projection (SRP) LSH variant as the scale path —
  * candidates come from bucket equi-joins, never a full cross join.
  * Arithmetic is done in double (floats widened) with sequential
  * `aggregate` folds so the DuckDB oracle computes the same values.
  */
object Similarity {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Exact brute-force cosine top-k per vector. O(n²) by definition —
    * the correctness baseline the LSH/IVF paths are measured against —
    * but executed as a broadcast + per-partition scoring KERNEL: the
    * corpus broadcasts once, each task scores its queries against it in
    * tight double loops and keeps a running top-k, so no n² row stream
    * ever materializes (the catalyst cross-join + window formulation
    * spent its time in interpreted higher-order exprs and a full-pair
    * shuffle). Accumulation order matches the DuckDB oracle's
    * list_dot_product (sequential over dims, double), so results
    * hash-match exactly. */
  def bruteTopK(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir).select($"vec_id", $"embedding")
      .as[(Long, Array[Float])]
    val corpus: Array[(Long, Array[Float], Double)] = e.collect()
      .map { case (id, v) => (id, v, normOf(v)) }
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(corpus)
    e.repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        val all = bc.value
        it.flatMap { case (aId, va) =>
          val na = normOf(va)
          // top-k by (sim desc, b_id asc): small insertion buffer
          val ids = new Array[Long](k)
          val sims = new Array[Double](k)
          var filled = 0
          var i = 0
          while (i < all.length) {
            val (bId, vb, nb) = all(i)
            if (bId != aId) {
              val s = dotOf(va, vb) / (na * nb)
              // better than current worst?
              if (filled < k || s > sims(filled - 1) ||
                  (s == sims(filled - 1) && bId < ids(filled - 1))) {
                var j = math.min(filled, k - 1)
                while (j > 0 && (sims(j - 1) < s || (sims(j - 1) == s && ids(j - 1) > bId))) {
                  sims(j) = sims(j - 1); ids(j) = ids(j - 1); j -= 1
                }
                sims(j) = s; ids(j) = bId
                if (filled < k) filled += 1
              }
            }
            i += 1
          }
          (0 until filled).map(r => (aId, ids(r), (r + 1).toLong))
        }
      }
      .toDF("a_id", "b_id", "rnk")
  }

  /** Sequential double fold over float dims — bit-identical to the
    * `aggregate`/`zip_with` fold and DuckDB's list_dot_product. */
  @inline private def dotOf(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  @inline private def normOf(a: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  // cosineNearDup SRP routing: 32 bands x 3 planes. For a pair at the
  // shipped tau=0.4 (angle 66.4deg, per-plane agreement p=0.63) the
  // per-pair miss probability is (1 - p^3)^32 ~ 1e-4; verified ZERO
  // misses vs the exact cross join on the sf0.01 and sf0.1 gate corpora
  // (deterministic hyperplanes => reproducible). At real near-dup
  // thresholds (tau >= 0.8) wider bands (8-16 planes) make candidate
  // volume genuinely sublinear; at tau as low as 0.4 no exact sublinear
  // method exists (3-bit buckets hold ~n/8 vectors), so the win here is
  // PLAN SHAPE: bucket equi-join + exact verify on candidate pairs —
  // no CartesianProduct / BroadcastNestedLoopJoin anywhere (PlanSpec).
  val NearDupBands = 32
  val NearDupPlanesPerBand = 3

  /** Per-band 3-bit SRP keys of an embedding (deterministic family,
    * disjoint from the ANN signature's planes). */
  def nearDupBandKeys(v: Seq[Float]): Array[Int] = {
    Array.tabulate(NearDupBands) { b =>
      var key = 0
      var j = 0
      while (j < NearDupPlanesPerBand) {
        val p = 7000 + b * NearDupPlanesPerBand + j
        var s = 0.0
        var d = 0
        while (d < v.length) { s += v(d) * planeSign(p, d); d += 1 }
        if (s > 0) key |= (1 << j)
        j += 1
      }
      key
    }
  }

  /** Near-duplicate pairs over a cosine threshold (percent, to keep the
    * driver compare on integers + ids). Candidates from SRP-LSH band
    * equi-joins; EXACT cosine verification on candidate pairs only, so
    * the emitted set equals the exact join's whenever the banding
    * covers it (asserted vs the cross-join oracle in OpsSpec and the
    * DuckDB gate). */
  def cosineNearDup(spark: SparkSession, dir: String, minCosPct: Int = 40): DataFrame = {
    import spark.implicits._
    val keysUdf = udf((v: Seq[Float]) => nearDupBandKeys(v))
    val bands = emb(spark, dir)
      .select($"vec_id", posexplode(keysUdf($"embedding")).as(Seq("band", "bk")))
    // distinct candidate ids FIRST (ids only through the band join),
    // then ONE exact cosine verification per distinct pair
    val cands = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
      .distinct()
    val ev = emb(spark, dir).select($"vec_id", $"embedding", norm($"embedding").as("nrm"))
    cands
      .join(ev.select($"vec_id".as("a_id"), $"embedding".as("ea"), $"nrm".as("na")), "a_id")
      .join(ev.select($"vec_id".as("b_id"), $"embedding".as("eb"), $"nrm".as("nb")), "b_id")
      .filter(dot($"ea", $"eb") / ($"na" * $"nb") >= lit(minCosPct / 100.0))
      .select($"a_id", $"b_id")
  }

  /** Exact all-pairs variant — the test-only oracle for cosineNearDup's
    * banding coverage (O(n^2), never the shipped plan). */
  def cosineNearDupExact(spark: SparkSession, dir: String, minCosPct: Int = 40): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir).select($"vec_id", $"embedding", norm($"embedding").as("nrm"))
    e.select($"vec_id".as("a_id"), $"embedding".as("ea"), $"nrm".as("na"))
      .crossJoin(e.select($"vec_id".as("b_id"), $"embedding".as("eb"), $"nrm".as("nb")))
      .filter($"a_id" < $"b_id")
      .filter(dot($"ea", $"eb") / ($"na" * $"nb") >= lit(minCosPct / 100.0))
      .select($"a_id", $"b_id")
  }

  // ------------------------------------------------- SRP-LSH scale path

  val Planes = 16     // signature bits
  val SrpBands = 2    // 2 bands x 8 bits
  val BitsPerBand = 8

  /** Deterministic ±1 hyperplane component for (plane, dim). */
  @inline private def planeSign(p: Int, d: Int): Int =
    if ((XxHash64.mix(0x5EED0000L + p, d.toLong) & 1L) == 0L) 1 else -1

  /** 16-bit signed-random-projection signature of an embedding. */
  def srpSignature(v: Seq[Float]): Int = {
    var sig = 0
    var p = 0
    while (p < Planes) {
      var s = 0.0
      var d = 0
      while (d < v.length) { s += v(d) * planeSign(p, d); d += 1 }
      if (s > 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** ANN via SRP-LSH banding: bucket equi-join on band keys generates
    * candidates (plus same-bucket diversity), exact cosine ranks them,
    * top-k per query. Approximate: recall vs bruteTopK is asserted in
    * SimilaritySpec, not 1.0 by construction. */
  def lshTopK(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    val sigUdf = udf((v: Seq[Float]) => srpSignature(v))
    val e = emb(spark, dir).select($"vec_id", $"embedding",
      norm($"embedding").as("nrm"), sigUdf($"embedding").as("sig"))
    val bandCols = (0 until SrpBands).map { b =>
      struct(lit(b).as("band"),
        shiftright($"sig", b * BitsPerBand).bitwiseAND(lit((1 << BitsPerBand) - 1)).as("bk"))
    }
    val buckets = e.select($"vec_id", $"embedding", $"nrm",
        explode(array(bandCols: _*)).as("bb"))
      .select($"vec_id", $"embedding", $"nrm", $"bb.band", $"bb.bk")
    val cands = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        (dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("sim"))
      .groupBy($"a_id", $"b_id").agg(first($"sim").as("sim"))
    val w = Window.partitionBy($"a_id").orderBy($"sim".desc, $"b_id")
    cands.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter($"rnk" <= k)
      .select($"a_id", $"b_id", $"rnk")
  }

  // ------------------------------------------------- IVF scale path

  /** ANN via an IVF-style coarse quantizer: deterministic centroid
    * sample (lowest xxhash64(vec_id) order — seeded, no RNG), each
    * vector assigned to its nearest centroid (one map over a broadcast
    * centroid table), queries probe the nProbe nearest centroids, and
    * candidates come from an equi-join on the cluster id — at scale the
    * vectors table is partitioned by cluster so a probe reads only
    * nProbe/nCentroids of the data. Exact cosine ranks candidates. */
  /** Deterministic coarse quantizer: centroid sample by lowest
    * xxhash64(vec_id) (TakeOrdered, not a full sort), unit-normalized. */
  private def coarseCentroids(e: DataFrame, nCentroids: Int): Array[(Int, Array[Double])] = {
    import e.sparkSession.implicits._
    e.select($"vec_id", $"embedding")
      .orderBy(xxhash64($"vec_id"), $"vec_id")
      .limit(nCentroids)
      .collect()
      .zipWithIndex
      .map { case (r, i) =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        val n = math.sqrt(v.map(x => x * x).sum)
        (i, v.map(_ / math.max(n, 1e-12)))
      }
  }

  /** Cosine of `v` against every centroid. */
  private def centroidCosines(
      centroids: Array[(Int, Array[Double])], v: Seq[Float]): Array[(Int, Double)] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    centroids.map { case (cid, c) =>
      var d = 0.0; var i = 0
      while (i < v.length) { d += v(i) * c(i); i += 1 }
      (cid, d / math.max(n, 1e-12))
    }
  }

  def ivfTopK(spark: SparkSession, dir: String, k: Int = 5,
              nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir).select($"vec_id", $"embedding", norm($"embedding").as("nrm"))
    val centroids = coarseCentroids(e, nCentroids)
    val cB = spark.sparkContext.broadcast(centroids)
    val assignUdf = udf((v: Seq[Float]) => centroidCosines(cB.value, v).maxBy(_._2)._1)
    val probesUdf = udf((v: Seq[Float]) =>
      centroidCosines(cB.value, v).sortBy(-_._2).take(nProbe).map(_._1))
    // candidate scoring stays in the codegen'd higher-order fold —
    // measured FASTER than a tight-loop Scala UDF here (UDF pays
    // per-element boxing through the Seq[Float] bridge: 17-23s vs
    // 13s at sf0.1), and it matches the oracle's accumulation shape
    val assigned = e.withColumn("cluster", assignUdf($"embedding"))
    val queries = e.withColumn("probes", probesUdf($"embedding"))
      .select($"vec_id".as("a_id"), $"embedding".as("ea"), $"nrm".as("na"),
        explode($"probes").as("cluster"))
    val cands = queries.join(
        assigned.select($"vec_id".as("b_id"), $"embedding".as("eb"),
          $"nrm".as("nb"), $"cluster"), "cluster")
      .filter($"a_id" =!= $"b_id")
      .select($"a_id", $"b_id", (dot($"ea", $"eb") / ($"na" * $"nb")).as("sim"))
      .groupBy($"a_id", $"b_id").agg(first($"sim").as("sim"))
    val w = Window.partitionBy($"a_id").orderBy($"sim".desc, $"b_id")
    cands.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter($"rnk" <= k)
      .select($"a_id", $"b_id", $"rnk")
  }

  /** IVF with the 100 TB layout MATERIALIZED: the corpus is written as
    * parquet PARTITIONED BY its coarse cluster id — the "inverted
    * lists" — and a (small) query batch probes only its union of
    * nProbe clusters via a literal partition filter, so the scan reads
    * probed-clusters/nCentroids of the data (PartitionFilters reach the
    * scan; PlanSpec asserts actual file pruning). Results are
    * bit-identical to [[ivfTopK]] for the same queries (same centroid
    * family, same probe rule, same candidates — only the I/O layout
    * differs), asserted in OpsSpec. */
  def ivfPartitionedTopK(spark: SparkSession, dir: String, k: Int = 5,
                         nCentroids: Int = 16, nProbe: Int = 4,
                         nQueries: Int = 64): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir).select($"vec_id", $"embedding", norm($"embedding").as("nrm"))
    val centroids = coarseCentroids(e, nCentroids)
    val cB = spark.sparkContext.broadcast(centroids)
    val assignUdf = udf((v: Seq[Float]) => centroidCosines(cB.value, v).maxBy(_._2)._1)
    val probesUdf = udf((v: Seq[Float]) =>
      centroidCosines(cB.value, v).sortBy(-_._2).take(nProbe).map(_._1))

    // build the inverted lists once (in production: a maintained table)
    val idxDir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    e.withColumn("cluster", assignUdf($"embedding"))
      .write.mode("overwrite").partitionBy("cluster").parquet(idxDir)
    val index = spark.read.parquet(idxDir)

    // deterministic query batch (seeded sample, no RNG)
    val queries = e.orderBy(xxhash64($"vec_id", lit(17L)), $"vec_id").limit(nQueries)
      .withColumn("probes", probesUdf($"embedding"))
      .select($"vec_id".as("a_id"), $"embedding".as("ea"), $"nrm".as("na"),
        explode($"probes").as("cluster"))
      .persist()
    val probed = queries.select($"cluster").distinct().as[Int].collect().toSeq.sorted

    // literal IN filter on the partition column -> static pruning: only
    // the probed inverted lists are ever read
    val lists = index.filter($"cluster".isin(probed: _*))
      .select($"vec_id".as("b_id"), $"embedding".as("eb"), $"nrm".as("nb"), $"cluster")
    val cands = queries.join(lists, "cluster")
      .filter($"a_id" =!= $"b_id")
      .select($"a_id", $"b_id", (dot($"ea", $"eb") / ($"na" * $"nb")).as("sim"))
      .groupBy($"a_id", $"b_id").agg(first($"sim").as("sim"))
    val w = Window.partitionBy($"a_id").orderBy($"sim".desc, $"b_id")
    cands.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter($"rnk" <= k)
      .select($"a_id", $"b_id", $"rnk")
  }

  /** The pruned index reader for PlanSpec's partition-pruning gate. */
  def ivfPrunedScan(spark: SparkSession, dir: String,
                    nCentroids: Int = 16, clusters: Seq[Int] = Seq(0, 1)): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir).select($"vec_id", $"embedding", norm($"embedding").as("nrm"))
    val centroids = coarseCentroids(e, nCentroids)
    val cB = spark.sparkContext.broadcast(centroids)
    val assignUdf = udf((v: Seq[Float]) => centroidCosines(cB.value, v).maxBy(_._2)._1)
    val idxDir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    e.withColumn("cluster", assignUdf($"embedding"))
      .write.mode("overwrite").partitionBy("cluster").parquet(idxDir)
    spark.read.parquet(idxDir).filter($"cluster".isin(clusters: _*))
  }

  val oracle: Map[String, String] = Map(
    "q_ann_bruteforce" ->
      """SELECT a_id, b_id, rnk FROM (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |      list_dot_product(a.embedding, b.embedding) /
        |      (sqrt(list_dot_product(a.embedding, a.embedding)) *
        |       sqrt(list_dot_product(b.embedding, b.embedding))) DESC, b.vec_id) AS rnk
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)
        |WHERE rnk <= 5""".stripMargin,
    "q_cosine_neardup" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.embedding, b.embedding) /
        |  (sqrt(list_dot_product(a.embedding, a.embedding)) *
        |   sqrt(list_dot_product(b.embedding, b.embedding))) >= 0.4""".stripMargin
  )
}
