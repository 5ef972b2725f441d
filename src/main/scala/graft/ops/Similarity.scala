package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.XxHash64

/** Similarity search over the `embeddings` table (Array[Float],
  * 64-dim): brute-force cosine top-k as the exact baseline, and
  * signed-random-projection (SRP) LSH / IVF variants as the scale
  * paths — candidates come from bucket equi-joins, never a full cross
  * join. Arithmetic is done in double (floats widened) with sequential
  * folds so the DuckDB oracle computes the same values.
  *
  * Signature/assignment extraction runs in `mapPartitions` KERNELS over
  * primitive float arrays: a per-row Scala UDF pays Seq[Float] boxing
  * for every plane dot product (96/row for the near-dup family), the
  * map-side cost that dominates at 100 TB. The banding join keys each
  * kernel emits are ALSO dumped as aux parquet by Verify, so the DuckDB
  * oracle can replay banding + exact verify bit-for-bit — making the
  * oracle contract corpus-independent (the LSH candidate set, not an
  * empirically-equal exact set, is what gets checked).
  */
object Similarity {

  private[ops] def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Typed corpus reader — primitive arrays for the kernels. */
  private[ops] def embTyped(spark: SparkSession, dir: String): Dataset[(Long, Array[Float])] = {
    import spark.implicits._
    emb(spark, dir).select($"vec_id", $"embedding").as[(Long, Array[Float])]
  }

  // Codegen float-array dot product (graft.functions.FloatDot): same
  // sequential-double accumulation as the higher-order
  // aggregate/zip_with fold it replaced — bit-identical results, same
  // DuckDB list_dot_product contract — but Spark evaluates higher-order
  // functions INTERPRETED per row, which was the dominant cost of the
  // similarity queries (q_ivf_ann 5.9s -> measured drop after the swap).
  private def dot(a: Column, b: Column): Column = graft.functions.FloatDot(a, b)

  private def norm(a: Column): Column = sqrt(graft.functions.FloatDot(a, a))

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
    val e = embTyped(spark, dir)
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

  /** Exact all-pairs cosine near-dup as a shipped, ORACLE-CHECKED
    * query: the labeled O(n²) baseline (like [[bruteTopK]]) executed as
    * a broadcast + per-partition kernel — no catalyst CartesianProduct,
    * no n² row materialization; each task streams its slice of queries
    * against the broadcast corpus in tight double loops. This entry
    * carries the exact all-pairs DuckDB oracle; the LSH-routed
    * [[cosineNearDup]] carries an aux-signature oracle that replays its
    * own banding, so neither contract depends on the corpus draw. */
  def cosineExact(spark: SparkSession, dir: String, minCosPct: Int = 40): DataFrame = {
    import spark.implicits._
    val e = embTyped(spark, dir)
    val corpus: Array[(Long, Array[Float], Double)] = e.collect()
      .map { case (id, v) => (id, v, normOf(v)) }
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(corpus)
    val thresh = minCosPct / 100.0
    e.repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        val all = bc.value
        it.flatMap { case (aId, va) =>
          val na = normOf(va)
          val out = Vector.newBuilder[(Long, Long)]
          var i = 0
          while (i < all.length) {
            val (bId, vb, nb) = all(i)
            if (aId < bId && dotOf(va, vb) / (na * nb) >= thresh)
              out += ((aId, bId))
            i += 1
          }
          out.result()
        }
      }
      .toDF("a_id", "b_id")
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
  def nearDupBandKeys(v: Array[Float]): Array[Int] = {
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

  /** (vec_id, band, bk) SRP band keys for the near-dup family —
    * mapPartitions kernel over primitive arrays (96 plane dots per row
    * stay unboxed). Shared by [[cosineNearDup]] and the aux oracle dump
    * so the DuckDB side replays exactly these keys. */
  def nearDupBands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    embTyped(spark, dir)
      .mapPartitions { it =>
        it.flatMap { case (id, v) =>
          val ks = nearDupBandKeys(v)
          Iterator.tabulate(ks.length)(b => (id, b, ks(b)))
        }
      }
      .toDF("vec_id", "band", "bk")
  }

  /** Band rows carrying the vector's FULL packed key vector: 32 3-bit
    * band keys in two longs (groups 0-15 at bits 3i of k0, 16-31 at
    * bits 3(i-16) of k1) — what lets the pair join dedup WITHOUT a
    * shuffle (see [[cosineNearDup]]). Same key family as
    * [[nearDupBands]] (shared [[nearDupBandKeys]] kernel), so the aux
    * oracle dump replays exactly this banding. */
  private def nearDupBandsPacked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    embTyped(spark, dir)
      .mapPartitions { it =>
        it.flatMap { case (id, v) =>
          val ks = nearDupBandKeys(v)
          var k0 = 0L; var k1 = 0L
          var i = 0
          while (i < ks.length) {
            if (i < 16) k0 |= ks(i).toLong << (3 * i)
            else k1 |= ks(i).toLong << (3 * (i - 16))
            i += 1
          }
          Iterator.tabulate(ks.length)(b => (id, b, ks(b), k0, k1))
        }
      }
      .toDF("vec_id", "band", "bk", "k0", "k1")
  }

  /** Index of the FIRST band whose 3-bit key agrees, given the XORs of
    * the two packed key vectors (a 32-arm codegen'd CASE — group i
    * agrees iff its 3 xor bits are zero). Total because the inputs
    * always come from a band join: at least the joined band agrees. */
  private def firstAgreeBand(x0: Column, x1: Column): Column = {
    def grp(x: Column, off: Int) = shiftright(x, off).bitwiseAND(lit(7L))
    (0 until NearDupBands).foldRight(lit(NearDupBands): Column) { (i, rest) =>
      val g = if (i < 16) grp(x0, 3 * i) else grp(x1, 3 * (i - 16))
      when(g === 0L, lit(i)).otherwise(rest)
    }
  }

  /** Near-duplicate pairs over a cosine threshold (percent, to keep the
    * driver compare on integers + ids). Candidates from SRP-LSH band
    * equi-joins; EXACT cosine verification on candidate pairs only, so
    * the emitted set equals the exact join's whenever the banding
    * covers it (asserted vs the cross-join formulation in OpsSpec; the
    * DuckDB oracle replays the banding from the aux key dump, so ITS
    * contract is bit-exact on any corpus).
    *
    * r6 dedup-shuffle removal (guide §2.3/§2.4): a pair agreeing on m
    * bands used to surface m times and be collapsed by a `.distinct()`
    * — an exchange + global hash-dedup of the (quadratic-ish) candidate
    * stream, measured as ~45% of this query. Instead each band row
    * carries the vector's packed 32-key vector and a pair is KEPT ONLY
    * IN ITS FIRST AGREEING BAND (the classic emit-once LSH rule): a
    * codegen'd filter, exactly one survivor per candidate pair, no
    * exchange. The extra shuffle weight is 16 bytes per band row —
    * linear in the corpus — traded against an exchange of the
    * candidate PAIR stream, which is the super-linear term. */
  def cosineNearDup(spark: SparkSession, dir: String, minCosPct: Int = 40): DataFrame = {
    import spark.implicits._
    val bands = nearDupBandsPacked(spark, dir)
    val cands = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter(firstAgreeBand(col("a.k0").bitwiseXOR(col("b.k0")),
        col("a.k1").bitwiseXOR(col("b.k1"))) === col("a.band"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
    val ev = emb(spark, dir).select($"vec_id", $"embedding", norm($"embedding").as("nrm"))
    cands
      .join(ev.select($"vec_id".as("a_id"), $"embedding".as("ea"), $"nrm".as("na")), "a_id")
      .join(ev.select($"vec_id".as("b_id"), $"embedding".as("eb"), $"nrm".as("nb")), "b_id")
      .filter(dot($"ea", $"eb") / ($"na" * $"nb") >= lit(minCosPct / 100.0))
      .select($"a_id", $"b_id")
  }

  /** Exact all-pairs variant via catalyst cross join — the test-only
    * oracle for cosineNearDup's banding coverage (never the shipped
    * plan; the shipped exact entry is the kernel-based [[cosineExact]]). */
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
  def srpSignature(v: Array[Float]): Int = {
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

  /** (vec_id, embedding, nrm, band, bk) bucketed rows for the ANN
    * banding — signature + norm computed in one mapPartitions kernel
    * (primitive arrays; normOf is bit-identical to the codegen fold),
    * bands exploded from the 16-bit signature. */
  private def lshBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = embTyped(spark, dir)
      .mapPartitions(_.map { case (id, v) => (id, v, normOf(v), srpSignature(v)) })
      .toDF("vec_id", "embedding", "nrm", "sig")
    val bandCols = (0 until SrpBands).map { b =>
      struct(lit(b).as("band"),
        shiftright($"sig", b * BitsPerBand).bitwiseAND(lit((1 << BitsPerBand) - 1)).as("bk"))
    }
    // sig rides along: the candidate join's emit-once dedup filter
    // (see lshTopK) recomputes band agreement from the two signatures
    e.select($"vec_id", $"embedding", $"nrm", $"sig", explode(array(bandCols: _*)).as("bb"))
      .select($"vec_id", $"embedding", $"nrm", $"sig", $"bb.band", $"bb.bk")
  }

  /** Aux dump for the DuckDB oracle: just the banding keys (sig is an
    * internal dedup carrier, never dumped). */
  def lshBandsAux(spark: SparkSession, dir: String): DataFrame =
    lshBuckets(spark, dir).select("vec_id", "band", "bk")

  /** ANN via SRP-LSH banding: bucket equi-join on band keys generates
    * candidates (plus same-bucket diversity), exact cosine ranks them,
    * top-k per query. Approximate: recall vs bruteTopK is asserted in
    * OpsSpec; the DuckDB oracle replays the banding from the aux key
    * dump, so the emitted set itself is bit-checked. */
  def lshTopK(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    val buckets = lshBuckets(spark, dir)
    // emit-once dedup (r6, the cosineNearDup rule — sound here because
    // the LSH bands are UNcapped): a pair agreeing on both bands used to
    // surface twice and be collapsed by a groupBy/first — an exchange of
    // the scored candidate stream. Band agreement is recomputable from
    // the two signatures, so "keep the pair only in its first agreeing
    // band" is a codegen'd filter: one survivor per pair, no exchange.
    val x = col("a.sig").bitwiseXOR(col("b.sig"))
    val firstAgree = (0 until SrpBands).foldRight(lit(SrpBands): Column) { (b, rest) =>
      when(shiftright(x, b * BitsPerBand)
        .bitwiseAND(lit((1 << BitsPerBand) - 1)) === 0, lit(b)).otherwise(rest)
    }
    val cands = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .filter(firstAgree === col("a.band"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        (dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("sim"))
    val w = Window.partitionBy($"a_id").orderBy($"sim".desc, $"b_id")
    cands.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter($"rnk" <= k)
      .select($"a_id", $"b_id", $"rnk")
  }

  // ------------------------------------------------- IVF scale path

  /** Deterministic seed for the coarse quantizer: centroid sample by
    * lowest xxhash64(vec_id) (TakeOrdered, not a full sort),
    * unit-normalized. */
  private def seedCentroids(e: DataFrame, nCentroids: Int): Array[(Int, Array[Double])] = {
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

  /** Lloyd iterations for the coarse quantizer (real IVF trains its
    * centroids; a raw hash sample wastes probes on lopsided cells). */
  val LloydIters = 2

  /** Fixed-point scale for the Lloyd accumulators: per-dim sums are
    * EXACT integer (round(x·2^20)) so the recomputed centroids are
    * bit-stable under any partitioning/shuffle order — a plain double
    * sum is association-dependent and would break the determinism
    * contract the aux oracles (and cross-JVM index reuse) rely on. */
  private val LloydFixed = (1L << 20).toDouble

  /** One Lloyd step: assign each vector to its nearest current
    * centroid (same kernel + tie rule as [[ivfAssigned]]), recompute
    * centroids as member means (map-side-combined reduceGroups over
    * integer accumulators — one shuffle of nCentroids rows),
    * unit-normalize. Empty cells keep their previous centroid. */
  private def lloydStep(spark: SparkSession, dir: String,
      centroids: Array[(Int, Array[Double])]): Array[(Int, Array[Double])] = {
    import spark.implicits._
    val cB = spark.sparkContext.broadcast(centroids)
    val dims = centroids(0)._2.length
    val sums = embTyped(spark, dir)
      .mapPartitions { it =>
        val cs = cB.value
        it.map { case (_, v) =>
          val cid = centroidCosines(cs, v).maxBy(_._2)._1
          (cid, v.map(x => math.round(x * LloydFixed)), 1L)
        }
      }
      .groupByKey(_._1)
      .reduceGroups { (a, b) =>
        val s = new Array[Long](dims)
        var i = 0
        while (i < dims) { s(i) = a._2(i) + b._2(i); i += 1 }
        (a._1, s, a._3 + b._3)
      }
      .map(_._2)
      .collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    centroids.map { case (cid, old) =>
      sums.get(cid) match {
        case Some((s, n)) =>
          val mean = s.map(_.toDouble / (n * LloydFixed))
          val nrm = math.sqrt(mean.map(x => x * x).sum)
          (cid, mean.map(_ / math.max(nrm, 1e-12)))
        case None => (cid, old)
      }
    }
  }

  /** Per-JVM cache of TRAINED centroids keyed by the corpus snapshot —
    * every IVF entry point (query, aux dumps, index build) must see
    * the identical centroid table or the aux oracle contract silently
    * breaks; the cache also avoids re-running the Lloyd jobs per call.
    * Cross-JVM consistency needs no cache: seed + integer-exact Lloyd
    * are deterministic functions of the corpus. */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Array[(Int, Array[Double])]]()

  private def coarseCentroids(spark: SparkSession, dir: String,
      nCentroids: Int): Array[(Int, Array[Double])] =
    centroidCache.computeIfAbsent((corpusSnapshotKey(dir), nCentroids), { _ =>
      var cs = seedCentroids(emb(spark, dir), nCentroids)
      (0 until LloydIters).foreach(_ => cs = lloydStep(spark, dir, cs))
      cs
    })

  /** Cosine of `v` against every centroid — primitive-array kernel. */
  private def centroidCosines(
      centroids: Array[(Int, Array[Double])], v: Array[Float]): Array[(Int, Double)] = {
    val n = normOf(v)
    centroids.map { case (cid, c) =>
      var d = 0.0; var i = 0
      while (i < v.length) { d += v(i) * c(i); i += 1 }
      (cid, d / math.max(n, 1e-12))
    }
  }

  /** (vec_id, embedding, nrm, cluster) nearest-centroid assignment —
    * mapPartitions kernel (the r2 Scala-UDF version paid Seq[Float]
    * boxing per row for the nCentroids dot products). */
  private def ivfAssigned(spark: SparkSession, dir: String,
      cB: org.apache.spark.broadcast.Broadcast[Array[(Int, Array[Double])]]): DataFrame = {
    import spark.implicits._
    embTyped(spark, dir)
      .mapPartitions { it =>
        val cs = cB.value
        it.map { case (id, v) =>
          (id, v, normOf(v), centroidCosines(cs, v).maxBy(_._2)._1)
        }
      }
      .toDF("vec_id", "embedding", "nrm", "cluster")
  }

  /** (vec_id, embedding, nrm, cluster) nProbe-nearest-centroid probe
    * rows per query — same kernel family as assignment; the embedding
    * and norm ride along so the scoring join needs no second corpus
    * scan. */
  private def ivfProbesFull(queries: Dataset[(Long, Array[Float])], nProbe: Int,
      cB: org.apache.spark.broadcast.Broadcast[Array[(Int, Array[Double])]]): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    queries
      .mapPartitions { it =>
        val cs = cB.value
        it.flatMap { case (id, v) =>
          val n = normOf(v)
          centroidCosines(cs, v).sortBy(-_._2).take(nProbe).map(p => (id, v, n, p._1))
        }
      }
      .toDF("vec_id", "embedding", "nrm", "cluster")
  }

  /** ANN via an IVF-style coarse quantizer: deterministic centroid
    * sample (lowest xxhash64(vec_id) order — seeded, no RNG), each
    * vector assigned to its nearest centroid (one kernel pass over a
    * broadcast centroid table), queries probe the nProbe nearest
    * centroids, and candidates come from an equi-join on the cluster
    * id — at scale the vectors table is partitioned by cluster so a
    * probe reads only nProbe/nCentroids of the data. Exact cosine
    * (codegen fold — measured FASTER than a tight-loop Scala UDF here:
    * boxing through Seq[Float], 17-23s vs 13s at sf0.1) ranks them. */
  def ivfTopK(spark: SparkSession, dir: String, k: Int = 5,
              nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    val centroids = coarseCentroids(spark, dir, nCentroids)
    val cB = spark.sparkContext.broadcast(centroids)
    val assigned = ivfAssigned(spark, dir, cB)
    val queries = ivfProbesFull(embTyped(spark, dir), nProbe, cB)
      .select($"vec_id".as("a_id"), $"embedding".as("ea"), $"nrm".as("na"), $"cluster")
    // NO pair-dedup aggregation (r6): a query's nProbe probe clusters
    // are distinct and every corpus vector is assigned to exactly one
    // cluster, so (a_id, b_id) is unique by construction — the old
    // groupBy/first was a full exchange of the scored candidate stream
    // that collapsed nothing (the oracle's DISTINCT is likewise a
    // no-op on these pairs)
    val cands = queries.join(
        assigned.select($"vec_id".as("b_id"), $"embedding".as("eb"),
          $"nrm".as("nb"), $"cluster"), "cluster")
      .filter($"a_id" =!= $"b_id")
      .select($"a_id", $"b_id", (dot($"ea", $"eb") / ($"na" * $"nb")).as("sim"))
    val w = Window.partitionBy($"a_id").orderBy($"sim".desc, $"b_id")
    cands.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter($"rnk" <= k)
      .select($"a_id", $"b_id", $"rnk")
  }

  /** Aux dumps for the IVF oracles: the assignment and the full-corpus
    * probe lists (what [[ivfTopK]] joins on). */
  def ivfAssignAux(spark: SparkSession, dir: String, nCentroids: Int = 16): DataFrame = {
    val cB = spark.sparkContext.broadcast(coarseCentroids(spark, dir, nCentroids))
    ivfAssigned(spark, dir, cB).select("vec_id", "cluster")
  }

  def ivfProbesAux(spark: SparkSession, dir: String,
                   nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val cB = spark.sparkContext.broadcast(coarseCentroids(spark, dir, nCentroids))
    ivfProbesFull(embTyped(spark, dir), nProbe, cB).select("vec_id", "cluster")
  }

  /** The deterministic nQueries-batch for [[ivfPartitionedTopK]] —
    * seeded sample, no RNG; tiny by construction (a labeled query
    * batch), so it collects to the driver. */
  private def queryBatch(spark: SparkSession, dir: String,
                         nQueries: Int): Array[(Long, Array[Float])] = {
    import spark.implicits._
    embTyped(spark, dir).toDF("vec_id", "embedding")
      .orderBy(xxhash64($"vec_id", lit(17L)), $"vec_id").limit(nQueries)
      .as[(Long, Array[Float])].collect()
  }

  def ivfBatchProbesAux(spark: SparkSession, dir: String, nCentroids: Int = 16,
                        nProbe: Int = 4, nQueries: Int = 64): DataFrame = {
    import spark.implicits._
    val centroids = coarseCentroids(spark, dir, nCentroids)
    spark.createDataset(queryBatch(spark, dir, nQueries).toSeq.flatMap { case (id, v) =>
      centroidCosines(centroids, v).sortBy(-_._2).take(nProbe).map(p => (id, p._1))
    }).toDF("vec_id", "cluster")
  }

  /** The inverted-list index is a MAINTAINED lake table
    * ([[graft.lake.IndexTable]]): built under `spark.graft.indexRoot`
    * (a lake path on a real cluster; a stable local default here),
    * with its manifest keyed by the corpus SNAPSHOT (file names +
    * sizes + mtimes of the embeddings parquet) — so a regenerated
    * corpus at the same path rebuilds instead of serving a stale
    * index, an unchanged corpus is reused across JVMs with zero
    * rebuild cost, and a rebuild lands in a fresh key directory with
    * the manifest flipped atomically last (no temp dirs, no
    * per-process copies — the r3 session cache made the index
    * JVM-lifetime; this makes it corpus-lifetime). */
  private[ops] def corpusSnapshotKey(dir: String): String =
    corpusSnapshotKey(dir, "embeddings.parquet")

  /** File-generic variant (Search's postings index now keys on its own
    * richer (file, mtime) signature — kept generic for the next
    * derived-table family). */
  private[ops] def corpusSnapshotKey(dir: String, fileName: String): String = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(s"$dir/$fileName")
    // close the listing stream (a bare Files.list leaks one fd per
    // call — and this runs on every IVF index lookup)
    val files =
      if (java.nio.file.Files.isDirectory(p))
        scala.util.Using.resource(java.nio.file.Files.list(p))(
          _.iterator().asScala.toVector.sortBy(_.toString))
      else Vector(p)
    dir + "|" + files.map { f =>
      s"${f.getFileName}:${java.nio.file.Files.size(f)}:" +
        java.nio.file.Files.getLastModifiedTime(f).toMillis
    }.mkString(",").hashCode
  }

  private[ops] def indexRoot(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.indexRoot")
      .getOrElse(sys.props("java.io.tmpdir") + "/graft_index_lake")

  private def ivfIndexDir(spark: SparkSession, dir: String, nCentroids: Int): String =
    synchronized { // serialize same-JVM builders; cross-JVM: see IndexTable
      // cv2: Lloyd-trained centroids; ls: salted write layout (file
      // count ≤ nCentroids × slots, see IndexTable.writeLayout).
      // Deliberately NO IndexTable.appendDelta here (the postings
      // index has it): appending with FROZEN centroids is the
      // standard IVF evolution, but this table's centroids are
      // Lloyd-trained on the full corpus, so a grown corpus retrains
      // them and can re-assign OLD vectors — a frozen-centroid delta
      // would diverge from the retrained-assignment aux oracle.
      // Append-with-frozen-quantizer would need its own key family
      // and a drift bound; out of scope, rebuild is the honest path.
      val key = corpusSnapshotKey(dir) + "|nc=" + nCentroids + "|cv2|ls=" + IvfSaltSlots
      // md5 of the absolute corpus path, same scheme (and rationale) as
      // BucketedLakeTable.tableName: a 32-bit String.hashCode collision
      // between two corpus dirs would share ONE IndexTable — the key
      // check prevents wrong reads, but each rebuild would retire the
      // other corpus's live key dir (perpetual thrash, and a concurrent
      // reader's files deleted mid-scan)
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(java.nio.file.Paths.get(dir).toAbsolutePath.toString.getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString
      val name = s"ivf_${h}_$nCentroids"
      val table = new graft.lake.IndexTable(indexRoot(spark), name)
      table.currentDir(key).getOrElse {
        import spark.implicits._
        val cB = spark.sparkContext.broadcast(coarseCentroids(spark, dir, nCentroids))
        table.rebuild(key, Seq("cluster"),
          graft.lake.IndexTable.writeLayout(ivfAssigned(spark, dir, cB),
            nCentroids, IvfSaltSlots, $"cluster", $"vec_id"))
      }.toString
    }

  /** Inverted-list write-layout salt slots: bounds the index to
    * nCentroids × slots files regardless of how many tasks scanned the
    * corpus during the build (a raw partitionBy write from a
    * 100k-partition scan would emit 100k × nCentroids files), while a
    * hot cluster still gets `slots` parallel writers. The price is ONE
    * build-time shuffle of the corpus, paid once per snapshot. */
  val IvfSaltSlots = 4

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
    val centroids = coarseCentroids(spark, dir, nCentroids)
    val index = spark.read.parquet(ivfIndexDir(spark, dir, nCentroids))

    // deterministic query batch: tiny by construction, held locally —
    // probes computed driver-side (no persisted DF to leak)
    val batch = queryBatch(spark, dir, nQueries)
    val queries = spark.createDataset(batch.toSeq.flatMap { case (id, v) =>
      centroidCosines(centroids, v).sortBy(-_._2).take(nProbe)
        .map(p => (id, v, normOf(v), p._1))
    }).toDF("a_id", "ea", "na", "cluster")
    val probed = queries.select($"cluster").distinct().as[Int].collect().toSeq.sorted

    // literal IN filter on the partition column -> static pruning: only
    // the probed inverted lists are ever read
    val lists = index.filter($"cluster".isin(probed: _*))
      .select($"vec_id".as("b_id"), $"embedding".as("eb"), $"nrm".as("nb"), $"cluster")
    // no pair-dedup aggregation — same uniqueness argument as ivfTopK
    val cands = queries.join(lists, "cluster")
      .filter($"a_id" =!= $"b_id")
      .select($"a_id", $"b_id", (dot($"ea", $"eb") / ($"na" * $"nb")).as("sim"))
    val w = Window.partitionBy($"a_id").orderBy($"sim".desc, $"b_id")
    cands.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter($"rnk" <= k)
      .select($"a_id", $"b_id", $"rnk")
  }

  /** The pruned index reader for PlanSpec's partition-pruning gate
    * (reuses the session-cached index). */
  def ivfPrunedScan(spark: SparkSession, dir: String,
                    nCentroids: Int = 16, clusters: Seq[Int] = Seq(0, 1)): DataFrame = {
    import spark.implicits._
    spark.read.parquet(ivfIndexDir(spark, dir, nCentroids))
      .filter($"cluster".isin(clusters: _*))
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
    // the exact all-pairs near-dup contract rides on the kernel-exact
    // entry; the LSH-routed entries below are checked against their own
    // banding (aux key dumps), so no oracle depends on the corpus draw
    "q_cosine_exact" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.embedding, b.embedding) /
        |  (sqrt(list_dot_product(a.embedding, a.embedding)) *
        |   sqrt(list_dot_product(b.embedding, b.embedding))) >= 0.4""".stripMargin,
    "q_cosine_neardup" ->
      """WITH keys AS (SELECT * FROM read_parquet('{AUX}/neardup_bands/*.parquet')),
        |cands AS (
        |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bk = b.bk
        |       AND a.vec_id < b.vec_id)
        |SELECT c.a_id, c.b_id
        |FROM cands c JOIN embeddings a ON a.vec_id = c.a_id
        |JOIN embeddings b ON b.vec_id = c.b_id
        |WHERE list_dot_product(a.embedding, b.embedding) /
        |  (sqrt(list_dot_product(a.embedding, a.embedding)) *
        |   sqrt(list_dot_product(b.embedding, b.embedding))) >= 0.4""".stripMargin,
    "q_lsh_ann" ->
      """WITH keys AS (SELECT * FROM read_parquet('{AUX}/lsh_bands/*.parquet')),
        |cands AS (
        |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bk = b.bk
        |       AND a.vec_id <> b.vec_id),
        |scored AS (
        |  SELECT c.a_id, c.b_id,
        |    list_dot_product(a.embedding, b.embedding) /
        |      (sqrt(list_dot_product(a.embedding, a.embedding)) *
        |       sqrt(list_dot_product(b.embedding, b.embedding))) AS sim
        |  FROM cands c JOIN embeddings a ON a.vec_id = c.a_id
        |  JOIN embeddings b ON b.vec_id = c.b_id)
        |SELECT a_id, b_id, rnk FROM (
        |  SELECT a_id, b_id,
        |    row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) AS rnk
        |  FROM scored) WHERE rnk <= 5""".stripMargin,
    "q_ivf_ann" ->
      """WITH assign AS (SELECT * FROM read_parquet('{AUX}/ivf_assign/*.parquet')),
        |probes AS (SELECT * FROM read_parquet('{AUX}/ivf_probes/*.parquet')),
        |cands AS (
        |  SELECT DISTINCT p.vec_id AS a_id, s.vec_id AS b_id
        |  FROM probes p JOIN assign s ON p.cluster = s.cluster
        |       AND p.vec_id <> s.vec_id),
        |scored AS (
        |  SELECT c.a_id, c.b_id,
        |    list_dot_product(a.embedding, b.embedding) /
        |      (sqrt(list_dot_product(a.embedding, a.embedding)) *
        |       sqrt(list_dot_product(b.embedding, b.embedding))) AS sim
        |  FROM cands c JOIN embeddings a ON a.vec_id = c.a_id
        |  JOIN embeddings b ON b.vec_id = c.b_id)
        |SELECT a_id, b_id, rnk FROM (
        |  SELECT a_id, b_id,
        |    row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) AS rnk
        |  FROM scored) WHERE rnk <= 5""".stripMargin,
    "q_ivf_partitioned" ->
      """WITH assign AS (SELECT * FROM read_parquet('{AUX}/ivf_assign/*.parquet')),
        |probes AS (SELECT * FROM read_parquet('{AUX}/ivf_batch_probes/*.parquet')),
        |cands AS (
        |  SELECT DISTINCT p.vec_id AS a_id, s.vec_id AS b_id
        |  FROM probes p JOIN assign s ON p.cluster = s.cluster
        |       AND p.vec_id <> s.vec_id),
        |scored AS (
        |  SELECT c.a_id, c.b_id,
        |    list_dot_product(a.embedding, b.embedding) /
        |      (sqrt(list_dot_product(a.embedding, a.embedding)) *
        |       sqrt(list_dot_product(b.embedding, b.embedding))) AS sim
        |  FROM cands c JOIN embeddings a ON a.vec_id = c.a_id
        |  JOIN embeddings b ON b.vec_id = c.b_id)
        |SELECT a_id, b_id, rnk FROM (
        |  SELECT a_id, b_id,
        |    row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) AS rnk
        |  FROM scored) WHERE rnk <= 5""".stripMargin
  )
}
