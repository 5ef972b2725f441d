package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over the documents table: a MATERIALIZED
  * inverted index (term postings as a bucket-partitioned
  * [[graft.lake.IndexTable]], the text sibling of the IVF inverted
  * lists) serving keyword search with partition-pruned scans, plus a
  * tf/df distinctive-terms ranking — both in exact integer arithmetic
  * so the DuckDB oracles replay them bit-for-bit.
  *
  * Scale shape: the index is built ONCE per corpus snapshot (one
  * tokenize + one (term, doc_id) shuffle over the corpus — the same
  * cost as any dedup pass) and every query after that reads only the
  * term-buckets of its query terms (buckets/NBuckets of the files,
  * file pruning plan-gated). The search itself never shuffles the
  * corpus: matched postings collapse to per-doc scores and the global
  * top-k is a distributed sort-limit (per-partition top-k, driver
  * merge), never a single-partition window.
  */
object Search {

  /** Tokenizer shared with TextOps: whitespace split of trimmed text —
    * `split(trim(text), '\s+')` ≡ DuckDB `regexp_split_to_array`. */
  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  private[ops] def tokens(spark: SparkSession, dir: String): DataFrame =
    tokensOf(docs(spark, dir))

  private def tokensOf(corpus: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select($"doc_id", $"source",
      explode(split(trim($"text"), "\\s+")).as("term"))
  }

  /** Term-bucket count for the postings layout. At web scale the vocab
    * is unbounded, so partitioning by raw term would explode the
    * partition count — terms hash into a fixed bucket space instead,
    * and a query prunes to the union of its terms' buckets. */
  val NBuckets = 64

  /** The inverted index rows: one posting per (term, doc) with its
    * term frequency, bucketed by term hash. */
  private[ops] def postings(spark: SparkSession, dir: String): DataFrame =
    postingsOf(docs(spark, dir))

  private def postingsOf(corpus: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    tokensOf(corpus)
      .groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(xxhash64($"term"), lit(NBuckets.toLong)))
  }

  /** Bucket ids of the query terms — the same xxhash64 the postings
    * writer used, evaluated by Spark on a terms-sized local dataset
    * (metadata-sized driver work, like the IVF query batch). */
  private def termBuckets(spark: SparkSession, terms: Seq[String]): Seq[Long] = {
    import spark.implicits._
    spark.createDataset(terms)
      .select(pmod(xxhash64($"value"), lit(NBuckets.toLong)))
      .as[Long].collect().distinct.toSeq
  }

  /** Write-layout salt slots: bounds the postings index to at most
    * NBuckets × SaltSlots files PER BUILD (see
    * [[graft.lake.IndexTable.writeLayout]]) while keeping SaltSlots
    * parallel writers inside a hot bucket. */
  val SaltSlots = 4

  /** (file name, mtime) of the documents parquet data files, sorted —
    * the corpus snapshot identity AND the append-detection state
    * stored in the index manifest (a real catalog reads this from its
    * table snapshots instead of the filesystem). */
  private def docFileSig(dir: String): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(s"$dir/documents.parquet")
    // the driver fixtures are single parquet FILES; engine-written
    // corpora are directories of part files (only those can append)
    if (!java.nio.file.Files.isDirectory(p))
      Seq(p.getFileName.toString ->
        java.nio.file.Files.getLastModifiedTime(p).toMillis)
    else {
      val files = scala.util.Using.resource(java.nio.file.Files.list(p))(
        _.iterator().asScala.toVector)
      files.map(_.getFileName.toString).filter(_.endsWith(".parquet")).sorted
        .map(n => n -> java.nio.file.Files.getLastModifiedTime(p.resolve(n)).toMillis)
    }
  }

  private def sigString(sig: Seq[(String, Long)]): String =
    sig.map { case (n, m) => s"$n:$m" }.mkString(",")

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The postings index as a maintained lake table: snapshot-keyed on
    * the documents parquet (cross-JVM reuse via the manifest), the
    * [[Similarity.ivfIndexDir]] discipline — PLUS incremental append:
    * when the corpus has only GAINED data files (old files present
    * with identical mtimes), the update tokenizes and shuffles ONLY
    * the new files into a delta directory — delta-sized work instead
    * of a 100 TB re-shuffle for a 1% append. Sound because appended
    * docs are brand-new doc_ids: their (term, doc_id, tf) postings
    * never merge with any base row, so base ∪ delta IS the full
    * index. Any other change (rewrite, deletion, compaction) falls
    * back to a full rebuild. */
  private[ops] def postingsIndexDirs(spark: SparkSession, dir: String): Seq[String] =
    synchronized { // serialize same-JVM builders; cross-JVM: see IndexTable
      import spark.implicits._
      val sig = docFileSig(dir)
      val params = s"|nb=$NBuckets|ls=$SaltSlots"
      val key = md5Hex(sigString(sig)) + params
      val h = md5Hex(java.nio.file.Paths.get(dir).toAbsolutePath.toString).take(16)
      val table = new graft.lake.IndexTable(Similarity.indexRoot(spark), s"post_${h}_$NBuckets")
      def layout(df: DataFrame) =
        graft.lake.IndexTable.writeLayout(df, NBuckets, SaltSlots, $"bucket", $"term")
      table.currentDirs(key).getOrElse {
        val prior = table.snapshot(0)
        val priorKey = prior.flatMap(_.properties.get("key"))
        val priorFiles = prior.flatMap(_.properties.get("files")).toSeq
          .flatMap(_.split(",")).filter(_.nonEmpty)
          .map { s => val i = s.lastIndexOf(':'); (s.take(i), s.drop(i + 1).toLong) }
        val sigSet = sig.toSet
        val newFiles = sig.filterNot(priorFiles.toSet)
        // append soundness needs BRAND-NEW doc_ids, and file-level
        // detection alone cannot see ids (r6, advisor): appended part
        // files carrying EXISTING doc_ids would split a (term, doc_id)
        // posting across base+delta — sum(tf) still agrees but
        // keywordSearch's n_terms (posting-row count) double-counts.
        // The base manifest records its max doc_id; a delta whose min
        // id does not exceed it falls back to a full rebuild.
        val priorMaxId = prior.flatMap(_.properties.get("max_doc_id")).map(_.toLong)
        val appendable = priorKey.exists(_.endsWith(params)) &&
          priorFiles.nonEmpty && newFiles.nonEmpty && priorFiles.forall(sigSet) &&
          priorMaxId.isDefined
        val appended =
          if (!appendable) None
          else {
            val paths = newFiles.map { case (n, _) => s"$dir/documents.parquet/$n" }
            val delta = spark.read.parquet(paths: _*)
            val mm = delta.agg(min($"doc_id"), max($"doc_id")).head
            if (mm.isNullAt(0) || mm.getLong(0) <= priorMaxId.get) None
            else table.appendDelta(priorKey.get, key, Seq("bucket"),
              layout(postingsOf(delta)),
              Map("files" -> sigString(sig),
                "max_doc_id" -> math.max(priorMaxId.get, mm.getLong(1)).toString))
          }
        appended.getOrElse {
          val maxId = spark.read.parquet(s"$dir/documents.parquet")
            .agg(max($"doc_id")).head
          Seq(table.rebuild(key, Seq("bucket"), layout(postings(spark, dir)),
            Map("files" -> sigString(sig),
              "max_doc_id" -> (if (maxId.isNullAt(0)) "-1"
                               else maxId.getLong(0).toString))))
        }
      }.map(_.toString)
    }

  /** Matched postings via the index, scanning ONLY the query terms'
    * buckets (the literal bucket IN-filter reaches the partitioned
    * scan of EVERY index dir — base plus append deltas; PlanSpec
    * asserts actual file pruning like the IVF probe). Dirs are read
    * individually and unioned so partition discovery never walks
    * above a key dir (a multi-root read would otherwise infer the
    * key= level as a partition column). */
  private[ops] def prunedPostingsScan(spark: SparkSession, dir: String,
                                      terms: Seq[String]): DataFrame = {
    import spark.implicits._
    val buckets = termBuckets(spark, terms)
    postingsIndexDirs(spark, dir)
      .map(spark.read.parquet(_))
      .reduce(_ unionByName _)
      .filter($"bucket".isin(buckets: _*) && $"term".isin(terms: _*))
  }

  /** The driver query's fixed term set — ONE Scala value interpolated
    * into both the operator and the oracle SQL (the mix-sources
    * pattern), chosen from the corpus vocabulary so the search is
    * non-vacuous at every fixture scale. */
  val QueryTerms = Seq("join", "hash", "vector")
  val TopK = 10

  /** Index-accelerated keyword search: sum-of-tf scoring over the
    * matched postings, global top-k by (score desc, doc_id) — a total
    * order, so ranks are deterministic. The top-k is orderBy+limit
    * (TakeOrderedAndProject: per-partition heads, driver merge), and
    * the rank window runs over ≤ k rows — no full-data single-task
    * window anywhere. Results are independent of the index layout:
    * the oracle recomputes the same scores straight from the
    * documents table in DuckDB. */
  def keywordSearch(spark: SparkSession, dir: String,
                    terms: Seq[String] = QueryTerms, k: Int = TopK): DataFrame = {
    import spark.implicits._
    val scored = prunedPostingsScan(spark, dir, terms)
      .groupBy($"doc_id")
      .agg(sum($"tf").as("score"), count(lit(1)).as("n_terms"))
      .orderBy($"score".desc, $"doc_id")
      .limit(k)
    scored
      .withColumn("rnk", row_number()
        .over(Window.orderBy($"score".desc, $"doc_id")).cast("bigint"))
      .select($"rnk", $"doc_id", $"score", $"n_terms")
  }

  /** Index-free reference formulation for the equality spec: the same
    * scores straight from the token stream. */
  private[ops] def keywordSearchBrute(spark: SparkSession, dir: String,
                                      terms: Seq[String] = QueryTerms,
                                      k: Int = TopK): DataFrame = {
    import spark.implicits._
    val scored = tokens(spark, dir)
      .filter($"term".isin(terms: _*))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .groupBy($"doc_id")
      .agg(sum($"tf").as("score"), count(lit(1)).as("n_terms"))
      .orderBy($"score".desc, $"doc_id")
      .limit(k)
    scored
      .withColumn("rnk", row_number()
        .over(Window.orderBy($"score".desc, $"doc_id")).cast("bigint"))
      .select($"rnk", $"doc_id", $"score", $"n_terms")
  }

  /** Fixed-point tf·idf scale and per-source cutoff. */
  val TfidfScale = 1000000L
  val TfidfTopK = 5

  /** Distinctive terms per source: tf = term occurrences inside the
    * source, df = distinct docs containing the term corpus-wide,
    * score = (tf · 10^6) div df — integer division, truncation on
    * non-negatives in both engines (the TextRank `div` ≡ `//`
    * contract), so the ranking is bit-exact cross-engine. Top-k per
    * source by (score desc, term) — a total order.
    *
    * Scale shape: two token shuffles (tf on (source, term), df on
    * term), then the vocab-sized df side joins tf (AQE broadcasts
    * it). The top-k rank is SKEW-PROOF like stratifiedSample: a
    * per-source vocabulary can be 10^8 terms, so a plain
    * Window.partitionBy(source) would sort a source's whole vocab in
    * ONE task — a salted pre-limit keeps each (source, salt)'s k best
    * first (any term in a source's global top-k is also in its
    * salt-group's top-k), bounding the final window to saltSlots × k
    * rows per source, bit-identical to the unlimited window. */
  def tfidfTerms(spark: SparkSession, dir: String, k: Int = TfidfTopK,
                 saltSlots: Int = 8): DataFrame = {
    import spark.implicits._
    val toks = tokens(spark, dir)
    val tf = toks.groupBy($"source", $"term").agg(count(lit(1)).as("tf"))
    val df = toks.groupBy($"term").agg(countDistinct($"doc_id").as("df"))
    val scored = tf.join(df, Seq("term"))
      .withColumn("score", expr(s"(tf * $TfidfScale) div df"))
    val pw = Window.partitionBy($"source", $"psalt").orderBy($"score".desc, $"term")
    val pre = scored
      .withColumn("psalt", pmod(xxhash64($"term"), lit(math.max(1, saltSlots))))
      .withColumn("prn", row_number().over(pw))
      .filter($"prn" <= k)
      .drop("psalt", "prn")
    val w = Window.partitionBy($"source").orderBy($"score".desc, $"term")
    pre
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter($"rnk" <= k)
      .select($"source", $"term", $"tf", $"df", $"score", $"rnk")
  }

  private def sqlTermList(terms: Seq[String]): String =
    terms.map(t => s"'$t'").mkString(", ")

  val oracle: Map[String, String] = Map(
    "q_keyword_search" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, term, count(*) AS tf FROM toks
         |  WHERE term IN (${sqlTermList(QueryTerms)}) GROUP BY 1, 2),
         |s AS (
         |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS score,
         |    CAST(count(*) AS BIGINT) AS n_terms
         |  FROM m GROUP BY 1),
         |r AS (
         |  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM s)
         |SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, score, n_terms
         |FROM r WHERE rnk <= $TopK""".stripMargin,
    "q_tfidf_terms" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
         |  FROM documents),
         |tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS tf
         |       FROM toks GROUP BY 1, 2),
         |df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |       FROM toks GROUP BY 1),
         |s AS (
         |  SELECT source, term, tf, df,
         |    CAST((tf * $TfidfScale) // df AS BIGINT) AS score
         |  FROM tf JOIN df USING (term)),
         |r AS (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY source ORDER BY score DESC, term) AS rnk
         |  FROM s)
         |SELECT source, term, tf, df, score, CAST(rnk AS BIGINT) AS rnk
         |FROM r WHERE rnk <= $TfidfTopK""".stripMargin
  )
}
