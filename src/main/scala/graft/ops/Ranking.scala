package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph centrality over corpus-derived graphs — the quality-weighting
  * family (CommonCrawl-style host ranking, TextRank keyword weighting;
  * Mihalcea & Tarau, "TextRank: Bringing Order into Texts", EMNLP
  * 2004): a weighted PageRank fixpoint run for a FIXED number of
  * rounds in EXACT integer arithmetic, so the result is a
  * deterministic, shuffle-order-independent function of the corpus and
  * the DuckDB oracle replays every round bit-for-bit (the established
  * sketch rule: the integer state is the output; float "scores" are
  * driver-side epilogues).
  *
  * Arithmetic: ranks are fixed-point integers at [[Scale]]. One round:
  *   contrib(u→v) = (r(u) * w(u,v)) div outw(u)     -- per-edge, exact
  *   r'(v) = Teleport + (85 * Σ contrib(·→v)) div 100
  * Integer division is truncation on both engines for the non-negative
  * operands used here (Spark `div` truncates toward zero, DuckDB `//`
  * floors — identical on non-negatives). Overflow bound: r ≤ N·Scale
  * (total mass is conserved up to truncation), so r·w stays under 2^63
  * while vocab·Scale·maxEdgeWeight < 9.2e18 — at Scale=1e9 that is
  * ~1e9 weighted-degree-sum headroom, documented, not checked per row.
  *
  * The iteration shape at 100 TB: ONE corpus pass builds the
  * co-occurrence graph (tokenize → adjacent pairs → count), and all
  * [[Iters]] rounds run on the GRAPH (vocabulary-sized, orders of
  * magnitude smaller than the corpus) — per round one src-keyed join +
  * one dst-keyed partial-agg shuffle, with every round's result
  * lineage-truncated (localCheckpoint) so the logical plan stays flat
  * (the clusterLabels discipline).
  */
object Ranking {

  /** Fixed-point scale of one unit of rank. */
  val Scale = 1000000000L

  /** Damping 0.85 as the integer pair (85, 100); teleport = 0.15·Scale
    * exactly. */
  val Teleport: Long = (15L * Scale) / 100L

  /** Fixed round count — rank after `Iters` rounds IS the operator's
    * semantics (not a convergence test: a tolerance would reintroduce
    * float drift). 8 rounds ≈ damping^8 < 0.28 residual, the usual
    * keyword-extraction operating point. */
  val Iters = 8

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** The undirected weighted co-occurrence graph: adjacent-token pairs
    * (self-pairs dropped), mirrored, weighted by corpus-wide count.
    * (src, dst, w, outw) — outw is src's total outgoing weight. */
  private[ops] def cooccurrenceEdges(corpus: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val pairs = corpus
      .select(split(trim($"text"), "\\s+").as("t"))
      .filter(size($"t") >= 2)
      .select(explode(transform(sequence(lit(1), size($"t") - 1), i =>
        struct(element_at($"t", i).as("a"), element_at($"t", i + 1).as("b")))).as("p"))
      .filter($"p.a" =!= $"p.b")
    // mirror with ONE explode (the clusterLabels lesson: a self-union
    // re-executes the uncached upstream tokenize per branch)
    val edges = pairs
      .select(explode(array(
        struct($"p.a".as("src"), $"p.b".as("dst")),
        struct($"p.b".as("src"), $"p.a".as("dst")))).as("e"))
      .groupBy($"e.src".as("src"), $"e.dst".as("dst"))
      .agg(count(lit(1)).as("w"))
    val out = edges.groupBy($"src").agg(sum($"w").as("outw"))
    edges.join(out, "src")
  }

  /** Weighted-PageRank ranks over a corpus' word co-occurrence graph:
    * (word, rank) with rank the exact integer fixpoint state after
    * [[Iters]] rounds. Words outside the graph (docs with one token /
    * only self-adjacent repeats) carry no edges and are not ranked —
    * the oracle derives its node set from the same mirrored edges. */
  def textRank(spark: SparkSession, dir: String): DataFrame =
    textRankOf(docs(spark, dir))

  /** Adaptive path split, same pattern (and default bound) as
    * clusterLabels: a vocabulary graph under ~4M edges is
    * driver-bounded metadata and the fixed rounds are pure integer
    * loops (ms), where each distributed round pays fresh job
    * scheduling (~0.35s/round measured — 3.0s of the 3.1s sweep cost
    * was scheduling a 31-node graph 16 times). Both paths compute the
    * identical integer fixpoint, asserted in OpsSpec. */
  val RankDriverMaxEdges = 4000000L

  private[ops] def textRankOf(corpus: DataFrame,
      driverMaxEdges: Long = RankDriverMaxEdges): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val edges = cooccurrenceEdges(corpus).persist()
    val eCount = edges.count()
    val out =
      if (eCount <= driverMaxEdges) driverRanks(spark, edges)
      else distributedRanks(edges)
    edges.unpersist()
    out
  }

  /** Small-graph path: the same integer rounds as literal driver
    * loops over the collected edge list. */
  private def driverRanks(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    val es = edges.select("src", "dst", "w", "outw")
      .as[(String, String, Long, Long)].collect()
    val nodes = es.map(_._1).distinct
    var r = nodes.map(_ -> Scale).toMap
    (1 to Iters).foreach { _ =>
      val c = scala.collection.mutable.HashMap.empty[String, Long]
      es.foreach { case (s, d, w, outw) =>
        c(d) = c.getOrElse(d, 0L) + (r(s) * w) / outw
      }
      r = nodes.map(n => n -> (Teleport + (85L * c.getOrElse(n, 0L)) / 100L)).toMap
    }
    nodes.sorted.map(n => (n, r(n))).toSeq.toDF("word", "rank")
  }

  /** Scale path: one src-keyed join + one dst-keyed partial-agg
    * shuffle per round, each round's result lineage-truncated. */
  private def distributedRanks(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val nodes = edges.select($"src".as("node")).distinct()
    var ranks = nodes.select($"node", lit(Scale).as("r")).localCheckpoint()
    (1 to Iters).foreach { _ =>
      val contrib = edges.join(ranks, edges("src") === ranks("node"))
        .select($"dst", expr("(r * w) div outw").as("c"))
        .groupBy($"dst").agg(sum($"c").as("c"))
      ranks = nodes.join(contrib, nodes("node") === contrib("dst"), "left_outer")
        .select($"node",
          (lit(Teleport) + expr("(85 * coalesce(c, 0L)) div 100")).as("r"))
        .localCheckpoint() // materializes this round; lineage stays flat
    }
    ranks.select($"node".as("word"), $"r".as("rank"))
  }

  // ------------------------------------------------------------ oracle

  /** Unrolled-round replay: the recursive fixpoint as [[Iters]] plain
    * CTE stages (portable to any SQL engine — no recursive-CTE
    * aggregation extension needed), every stage the same integer
    * expression as the Spark round. */
  val oracle: Map[String, String] = Map(
    "q_textrank" -> {
      val rounds = (1 to Iters).map { k =>
        s"""r$k AS (
           |  SELECT n.node, $Teleport + (85 * COALESCE(s.c, 0)) // 100 AS r
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node, CAST(sum((r.r * e.w) // e.outw) AS BIGINT) AS c
           |    FROM edges e JOIN r${k - 1} r ON r.node = e.src
           |    GROUP BY e.dst) s ON s.node = n.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH toks AS (
         |  SELECT regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
         |  WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 2),
         |pairs AS (
         |  SELECT t[i] AS a, t[i+1] AS b
         |  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)
         |  WHERE t[i] <> t[i+1]),
         |mirrored AS (
         |  SELECT a AS src, b AS dst FROM pairs
         |  UNION ALL SELECT b, a FROM pairs),
         |edges AS (
         |  SELECT src, dst, CAST(count(*) AS BIGINT) AS w,
         |    CAST(sum(count(*)) OVER (PARTITION BY src) AS BIGINT) AS outw
         |  FROM mirrored GROUP BY src, dst),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |r0 AS (SELECT node, CAST($Scale AS BIGINT) AS r FROM nodes),
         |$rounds
         |SELECT node AS word, CAST(r AS BIGINT) AS rank FROM r$Iters""".stripMargin
    }
  )
}
