package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed corpus-CURATION pipeline — the proof that the
  * individual training-data operators chain into the thing a pipeline
  * user actually runs: exact dedup → quality filter → repetition
  * filter, emitting the surviving docs with their token budgets.
  * Stage order is the standard one (dedup on the RAW corpus first, so
  * the kept representative is decided before any quality opinion), and
  * every stage BINDS on the driver fixture: the corpus is
  * [[Dedup.benchCorpus]] (documents + the planted zbench source), so
  * the dedup stage drops every zbench copy, the quality gate drops the
  * short/stopword-free docs, and the repetition gate drops the
  * most-templated ones. The whole chain is one DuckDB oracle.
  *
  * Plan shape: one fingerprint window (the dedup shuffle), the
  * repetition pair of aggregations, one doc_id equi-join — every stage
  * is the already-gated shape of its standalone operator; nothing
  * quadratic appears by composing them.
  */
object Curation {

  /** Repetition gate: keep docs whose top bigram is under 1/12 of all
    * bigrams (multiplication-only, so Spark and DuckDB agree exactly). */
  val RepetitionDenominator = 12

  def curate(spark: SparkSession, dir: String): DataFrame =
    curateCorpus(Dedup.benchCorpus(spark, dir))

  def curateCorpus(corpus: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def occurrences(marker: String) =
      ((length($"text") - length(replace($"text", lit(marker), lit("")))) /
        marker.length).cast("bigint")
    val nTokens = size(split(trim($"text"), "\\s+")).cast("bigint")
    val nStop = occurrences(" the ") + occurrences(" and ") + occurrences(" a ")
    val base = corpus.select($"doc_id", $"source", $"text",
      nTokens.as("n_tokens"), nStop.as("n_stop"),
      md5(lower(trim($"text"))).as("fp"))
    // groupBy + join back, NOT min-over-Window.partitionBy(fp) (r6,
    // verdict): a window partition buffers its whole group in ONE task,
    // so a pre-dedup mega-duplicate cluster became a single-task sort;
    // the aggregation has map-side partials. Result identical (keep iff
    // doc_id is the group min) — the exactDedup scale shape. The keep
    // side projects ONLY (fp, doc_id) before its exchange (guide §2.3)
    // so the token/stopword counts are never recomputed there.
    val keep = corpus
      .select(md5(lower(trim($"text"))).as("fp"), $"doc_id")
      .groupBy($"fp").agg(min($"doc_id").as("keep_id"))
    val deduped = base.join(keep, Seq("fp"))
      .filter($"doc_id" === $"keep_id")
    val qualified = deduped.filter($"n_tokens" >= 20 && $"n_stop" > 0)
    val rep = TextOps.repetitionOf(corpus)
    qualified.join(rep, Seq("doc_id"))
      .filter($"top_bigram_n" * RepetitionDenominator < $"n_bigrams")
      .select($"doc_id", $"source", $"n_tokens")
  }

  val oracle: Map[String, String] = Map(
    "q_curate" ->
      ("""WITH corpus AS (
        |  SELECT doc_id, source, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, 'zbench' AS source, text FROM documents
        |  WHERE doc_id % 7 = 0),
        |base AS (
        |  SELECT doc_id, source, text,
        |    CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |    (CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS BIGINT)
        |     + CAST((length(text) - length(replace(text, ' and ', ''))) / 5 AS BIGINT)
        |     + CAST((length(text) - length(replace(text, ' a ', ''))) / 3 AS BIGINT)) AS n_stop,
        |    md5(lower(trim(text))) AS fp
        |  FROM corpus),
        |deduped AS (
        |  SELECT * FROM (
        |    SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM base)
        |  WHERE doc_id = keep_id),
        |toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM corpus),
        |bg AS (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] AS bigram
        |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
        |        FROM toks WHERE len(w) >= 2)),
        |c AS (SELECT doc_id, bigram, count(*) AS n FROM bg GROUP BY 1, 2),
        |rep AS (SELECT doc_id, CAST(max(n) AS BIGINT) AS top_bigram_n,
        |        CAST(sum(n) AS BIGINT) AS n_bigrams FROM c GROUP BY 1)
        |SELECT d.doc_id, d.source, d.n_tokens
        |FROM deduped d JOIN rep r ON r.doc_id = d.doc_id
        |WHERE d.n_tokens >= 20 AND d.n_stop > 0
        |  AND r.top_bigram_n * """.stripMargin + RepetitionDenominator.toString +
        " < r.n_bigrams")
  )
}
