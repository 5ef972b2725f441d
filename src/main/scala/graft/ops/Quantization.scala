package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Product quantization over the `embeddings` table — the compression
  * path that makes 100 TB of float vectors scannable: each 64-dim
  * float vector (256 bytes) becomes M=4 sub-space code ids of K=16
  * centroids each (2 bytes), and ANN queries scan the code table with
  * per-query distance lookup tables (ADC — asymmetric distance
  * computation, Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) instead of the raw vectors.
  *
  * Determinism contract (what makes the DuckDB oracles exact):
  *  - codebooks are trained with the same machinery as the IVF coarse
  *    quantizer ([[Similarity]]): seeds by lowest `xxhash64(vec_id)`,
  *    two Lloyd steps whose per-dim accumulators are EXACT fixed-point
  *    integers (shuffle-order-independent sums), then cast to FLOAT —
  *    the float codebook is the published artifact (aux dump) both
  *    engines compute distances from;
  *  - every query-side distance is built ONLY from sequential-double
  *    dot products of float arrays ([[graft.functions.FloatDot]] ≡
  *    DuckDB `list_dot_product`) combined with the same literal
  *    expression shape (`cc - 2*xc`, `d0+d1+d2+d3` — left-assoc in
  *    both engines), so assignments and rankings are bit-identical;
  *  - argmin ties break to the LOWEST code id (strict `<` scan here,
  *    `ORDER BY dk, code` in the oracle).
  */
object Quantization {

  /** M sub-spaces of SubDim dims; K centroids per sub-space. 4x16 on a
    * 64-dim corpus: a 4-bit code per sub-space, 16 bits per vector —
    * the 128:1 compression that PQ exists for. M is structural (the
    * wide code row is (c0..c3)); K and iterations are tuning. */
  val M = 4
  val SubDim = 16
  val K = 16
  val LloydIters = 2

  /** Probe set for the ANN entry: a fixed arithmetic predicate (NOT a
    * sample dump) so the oracle derives the identical probe rows from
    * the corpus alone. */
  val ProbeMod = 31L

  /** ADC result depth. */
  val TopK = 10

  /** Fixed-point scale for Lloyd accumulators — same rationale as the
    * IVF trainer: integer per-dim sums are exact under any shuffle
    * order. */
  private val Fixed = (1L << 20).toDouble

  // --------------------------------------------------------- training

  /** Per-JVM trained-codebook cache keyed by corpus snapshot (same
    * contract as the IVF centroid cache: every entry point must see
    * the identical codebook or the aux oracle silently breaks).
    * cb(s)(code) is the SubDim-dim FLOAT centroid. */
  private val cbCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Array[Float]]]]()

  def codebooks(spark: SparkSession, dir: String): Array[Array[Array[Float]]] =
    cbCache.computeIfAbsent(Similarity.corpusSnapshotKey(dir),
      _ => train(spark, dir, LloydIters))

  /** Training entry with the iteration count exposed so the spec can
    * evidence that Lloyd actually reduces quantization distortion over
    * the raw seed codebook (iters=0). */
  private[ops] def train(spark: SparkSession, dir: String,
      iters: Int): Array[Array[Array[Float]]] = {
    import spark.implicits._
    val seeds = Similarity.emb(spark, dir)
      .select($"vec_id", $"embedding")
      .orderBy(xxhash64($"vec_id"), $"vec_id")
      .limit(K)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    var cbs: Array[Array[Array[Double]]] = Array.tabulate(M) { s =>
      seeds.map(v => Array.tabulate(SubDim)(d => v(s * SubDim + d).toDouble))
    }
    (0 until iters).foreach(_ => cbs = lloydStep(spark, dir, cbs))
    cbs.map(_.map(_.map(_.toFloat)))
  }

  /** One Lloyd step over ALL sub-spaces in a single corpus pass:
    * nearest-code assignment per (vector, sub-space), per-dim
    * fixed-point integer sums reduced per (sub-space, code) — one
    * shuffle of at most M*K rows — then plain means. Empty cells keep
    * their previous centroid. Training is internal (only the FINAL
    * float codebook is oracle-visible), but stays deterministic so the
    * codebook is a pure function of the corpus. */
  private def lloydStep(spark: SparkSession, dir: String,
      cbs: Array[Array[Array[Double]]]): Array[Array[Array[Double]]] = {
    import spark.implicits._
    val cB = spark.sparkContext.broadcast(cbs)
    val sums = Similarity.embTyped(spark, dir)
      .flatMap { case (_, v) =>
        val cs = cB.value
        (0 until M).iterator.map { s =>
          var best = 0; var bestD = Double.PositiveInfinity
          var code = 0
          // bound by the realized codebook (a corpus with fewer than K
          // vectors seeds fewer centroids), not the nominal K
          while (code < cs(s).length) {
            val c = cs(s)(code)
            var d = 0.0; var i = 0
            while (i < SubDim) {
              val e = v(s * SubDim + i).toDouble - c(i); d += e * e; i += 1
            }
            if (d < bestD) { bestD = d; best = code }
            code += 1
          }
          ((s, best),
            (Array.tabulate(SubDim)(i => math.round(v(s * SubDim + i) * Fixed)), 1L))
        }
      }
      .groupByKey(_._1)
      .reduceGroups { (a, b) =>
        val s = new Array[Long](SubDim)
        var i = 0
        while (i < SubDim) { s(i) = a._2._1(i) + b._2._1(i); i += 1 }
        (a._1, (s, a._2._2 + b._2._2))
      }
      .map { case (k, (_, sn)) => (k, sn) }
      .collect()
      .toMap
    Array.tabulate(M) { s =>
      Array.tabulate(cbs(s).length) { code =>
        sums.get((s, code)) match {
          case Some((sum, n)) => sum.map(_.toDouble / (n * Fixed))
          case None           => cbs(s)(code)
        }
      }
    }
  }

  /** The published codebook as a DataFrame — what the `{AUX}` dump
    * writes and what [[pqAnn]]'s lookup tables join against:
    * (subspace, code, centroid FLOAT[SubDim]). */
  def codebookDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    codebooks(spark, dir).zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (c, code) => (s, code, c.toSeq) }
    }.toSeq.toDF("subspace", "code", "centroid")
  }

  // --------------------------------------------------------- encoding

  /** Per-vector code row (vec_id, c0..c3) — a mapPartitions kernel
    * over the broadcast float codebook (the IVF-assignment shape: no
    * 64-rows-per-vector explode ever materializes; at the design point
    * the corpus is the big side and this pass is a zero-shuffle map).
    * dk = cc - 2*xc with both dots accumulated sequentially in double
    * over the FLOAT values — exactly DuckDB's
    * `list_dot_product(c,c) - 2*list_dot_product(x_slice, c)` — and
    * the `||x||²` term is dropped (constant per (vector, sub-space):
    * argmin-invariant on BOTH sides, so less float surface). */
  private def codesWide(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cbF = codebooks(spark, dir)
    val ccs: Array[Array[Double]] = cbF.map(_.map { c =>
      var acc = 0.0; var i = 0
      while (i < SubDim) { acc += c(i).toDouble * c(i).toDouble; i += 1 }
      acc
    })
    val cB = spark.sparkContext.broadcast((cbF, ccs))
    Similarity.embTyped(spark, dir)
      .mapPartitions { it =>
        val (cs, cc) = cB.value
        it.map { case (id, v) =>
          val codes = Array.tabulate(M) { s =>
            var best = 0; var bestK = Double.PositiveInfinity
            var code = 0
            while (code < cs(s).length) {
              val c = cs(s)(code)
              var xc = 0.0; var i = 0
              while (i < SubDim) { xc += v(s * SubDim + i).toDouble * c(i).toDouble; i += 1 }
              val dk = cc(s)(code) - 2.0 * xc
              if (dk < bestK) { bestK = dk; best = code }
              code += 1
            }
            best
          }
          (id, codes(0), codes(1), codes(2), codes(3))
        }
      }
      .toDF("vec_id", "c0", "c1", "c2", "c3")
  }

  /** Oracle-facing encoding: one (vec_id, subspace, code) row per
    * sub-space — an explode of [[codesWide]] (SHARED encoder, so the
    * q_pq_codes contract covers exactly what q_pq_ann scans). */
  def pqCodes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    codesWide(spark, dir).select($"vec_id", explode(array(
      (0 until M).map(s => struct(lit(s).as("subspace"), col(s"c$s").as("code"))): _*)).as("e"))
      .select($"vec_id", $"e.subspace".as("subspace"), $"e.code".as("code"))
  }

  // -------------------------------------------------------------- ADC

  private def dot(a: Column, b: Column): Column = graft.functions.FloatDot(a, b)

  /** ADC top-k: probes (`vec_id % ProbeMod = 0`) build a per-query
    * lookup table d(s, code) = cc - 2*qc against the broadcast
    * codebook, the code table is scanned once (broadcast-nested-loop
    * against the tiny probe list — the linear code scan IS the ADC
    * design), and each pair's approximate distance is the fixed-order
    * sum d0+d1+d2+d3 of four broadcast-hash LUT lookups. No raw-vector
    * access on the scan side: at the design point the probes + LUTs
    * are KB-sized broadcasts and the only corpus-wide data movement is
    * the final per-probe top-k window. */
  def pqAnn(spark: SparkSession, dir: String, k: Int = TopK): DataFrame = {
    import spark.implicits._
    val wide = codesWide(spark, dir)
    val probes = Similarity.emb(spark, dir)
      .filter($"vec_id" % ProbeMod === 0)
      .select($"vec_id".as("a_id"), $"embedding")
    val lut = probes.crossJoin(broadcast(codebookDf(spark, dir)))
      .select($"a_id", $"subspace", $"code",
        (dot($"centroid", $"centroid") -
          lit(2.0) * dot(slice($"embedding", $"subspace" * SubDim + 1, lit(SubDim)),
            $"centroid")).as("d"))
    def lutS(s: Int) = lut.filter($"subspace" === s)
      .select($"a_id", $"code".as(s"c$s"), $"d".as(s"d$s"))
    val scored = wide.crossJoin(broadcast(probes.select($"a_id")))
      .filter($"vec_id" =!= $"a_id")
      .join(broadcast(lutS(0)), Seq("a_id", "c0"))
      .join(broadcast(lutS(1)), Seq("a_id", "c1"))
      .join(broadcast(lutS(2)), Seq("a_id", "c2"))
      .join(broadcast(lutS(3)), Seq("a_id", "c3"))
      .select($"a_id", $"vec_id".as("b_id"),
        ($"d0" + $"d1" + $"d2" + $"d3").as("adist"))
    val w = Window.partitionBy($"a_id").orderBy($"adist", $"b_id")
    scored.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter($"rnk" <= k)
      .select($"a_id", $"b_id", $"rnk")
  }

  // ------------------------------------------------------------ oracle

  /** Shared SQL fragment: recompute the code assignment from the aux
    * codebook (the same dk expression and tie rule as the kernel). */
  private val CodesSql =
    s"""cb AS (SELECT * FROM read_parquet('{AUX}/pq_codebooks/*.parquet')),
       |scoredc AS (
       |  SELECT e.vec_id, cb.subspace, cb.code,
       |    list_dot_product(cb.centroid, cb.centroid)
       |      - 2 * list_dot_product(
       |          e.embedding[cb.subspace * $SubDim + 1 : cb.subspace * $SubDim + $SubDim],
       |          cb.centroid) AS dk
       |  FROM embeddings e, cb),
       |codes AS (
       |  SELECT vec_id, subspace, code FROM (
       |    SELECT vec_id, subspace, code,
       |      row_number() OVER (PARTITION BY vec_id, subspace ORDER BY dk, code) AS rn
       |    FROM scoredc) WHERE rn = 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_pq_codes" ->
      s"""WITH $CodesSql
         |SELECT vec_id, subspace, code FROM codes""".stripMargin,
    "q_pq_ann" ->
      s"""WITH $CodesSql,
         |wide AS (
         |  SELECT vec_id,
         |    max(CASE WHEN subspace = 0 THEN code END) AS c0,
         |    max(CASE WHEN subspace = 1 THEN code END) AS c1,
         |    max(CASE WHEN subspace = 2 THEN code END) AS c2,
         |    max(CASE WHEN subspace = 3 THEN code END) AS c3
         |  FROM codes GROUP BY vec_id),
         |probes AS (
         |  SELECT vec_id AS a_id, embedding FROM embeddings
         |  WHERE vec_id % $ProbeMod = 0),
         |lut AS (
         |  SELECT p.a_id, cb.subspace, cb.code,
         |    list_dot_product(cb.centroid, cb.centroid)
         |      - 2 * list_dot_product(
         |          p.embedding[cb.subspace * $SubDim + 1 : cb.subspace * $SubDim + $SubDim],
         |          cb.centroid) AS d
         |  FROM probes p, cb),
         |scored AS (
         |  SELECT p.a_id, w.vec_id AS b_id, l0.d + l1.d + l2.d + l3.d AS adist
         |  FROM probes p CROSS JOIN wide w
         |  JOIN lut l0 ON l0.a_id = p.a_id AND l0.subspace = 0 AND l0.code = w.c0
         |  JOIN lut l1 ON l1.a_id = p.a_id AND l1.subspace = 1 AND l1.code = w.c1
         |  JOIN lut l2 ON l2.a_id = p.a_id AND l2.subspace = 2 AND l2.code = w.c2
         |  JOIN lut l3 ON l3.a_id = p.a_id AND l3.subspace = 3 AND l3.code = w.c3
         |  WHERE w.vec_id <> p.a_id)
         |SELECT a_id, b_id, rnk FROM (
         |  SELECT a_id, b_id,
         |    row_number() OVER (PARTITION BY a_id ORDER BY adist, b_id) AS rnk
         |  FROM scored) WHERE rnk <= $TopK""".stripMargin
  )
}
