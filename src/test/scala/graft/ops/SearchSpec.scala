package graft.ops

import graft.SparkTestBase

/** Full-text retrieval: the materialized postings index must be an
  * ACCELERATOR, not a semantics change — index-served search equals
  * the straight token-stream formulation row for row, and the index
  * resolves from the manifest (no rebuild) on every lookup after the
  * first for the same corpus snapshot. */
class SearchSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("keyword search via the postings index equals the brute token-stream form") {
    val idx = Search.keywordSearch(spark, dir).collect().toSet
    val brute = Search.keywordSearchBrute(spark, dir).collect().toSet
    assert(idx == brute)
    assert(idx.size == Search.TopK, s"expected a full top-${Search.TopK}")
    // non-vacuous: the fixed QueryTerms are real fixture vocabulary,
    // so the top hit matches more than one posting
    assert(idx.map(_.getLong(2)).max > 1, "query terms absent from the corpus")
  }

  test("postings index is built once per corpus snapshot, manifest hit after") {
    val first = Search.postingsIndexDirs(spark, dir)
    val again = Search.postingsIndexDirs(spark, dir)
    assert(first == again, "second resolve must be a manifest hit, not a rebuild")
    assert(first.size == 1, "an unchanged corpus must resolve to the single base dir")
    // layout: one bucket=<v> partition dir per realized term bucket
    val buckets = new java.io.File(first.head).listFiles().count(_.getName.startsWith("bucket="))
    assert(buckets > 1 && buckets <= Search.NBuckets, s"buckets=$buckets")
    // salted write layout: file count bounded by buckets × slots, NOT
    // by upstream task count (the 1000-executor file-explosion guard)
    val files = spark.read.parquet(first.head).inputFiles.length
    assert(files <= Search.NBuckets * Search.SaltSlots, s"files=$files")
  }

  test("postings index appends a delta for a grown corpus; rewrite rebuilds") {
    import spark.implicits._
    val tmp = tmpDir("graft_post_append")
    def corpusDocs(ids: Range, body: String) =
      ids.map(i => (i.toLong, "alpha", s"$body w$i")).toDF("doc_id", "source", "text")
    corpusDocs(0 until 60, "join hash").coalesce(2)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val base = Search.postingsIndexDirs(spark, tmp)
    assert(base.size == 1)
    val baseListing = spark.read.parquet(base.head).inputFiles.sorted.toSeq
    // grow the corpus by NEW doc_ids (new part files, old untouched);
    // higher term mass so appended docs MUST surface in the top-k
    corpusDocs(100 until 140, "join join join hash").coalesce(1)
      .write.mode("append").parquet(s"$tmp/documents.parquet")
    val grown = Search.postingsIndexDirs(spark, tmp)
    assert(grown.size == 2, s"expected base + delta, got $grown")
    assert(grown.head == base.head, "base dir must be reused, not rebuilt")
    assert(spark.read.parquet(grown.head).inputFiles.sorted.toSeq == baseListing,
      "base dir contents must be untouched by the append")
    // the delta-built index serves the grown corpus exactly
    val viaIndex = Search.keywordSearch(spark, tmp).collect().toSet
    val brute = Search.keywordSearchBrute(spark, tmp).collect().toSet
    assert(viaIndex == brute)
    assert(viaIndex.exists(_.getLong(1) >= 100L), "appended docs missing from results")
    // an in-place REWRITE (same names impossible — overwrite changes
    // files) must fall back to a full single-dir rebuild
    corpusDocs(0 until 30, "join hash").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rebuilt = Search.postingsIndexDirs(spark, tmp)
    assert(rebuilt.size == 1, s"rewrite must rebuild, got $rebuilt")
    assert(rebuilt.head != base.head)
  }

  test("append with OVERLAPPING doc_ids falls back to a full rebuild (id guard)") {
    import spark.implicits._
    // file-level detection alone would append here (old files
    // untouched), but the new part file re-uses doc_id 10 — a split
    // (term, doc_id) posting across base+delta would double-count
    // n_terms. The max_doc_id guard must force a rebuild instead.
    val tmp = tmpDir("graft_post_overlap")
    def corpusDocs(ids: Range, body: String) =
      ids.map(i => (i.toLong, "alpha", s"$body w$i")).toDF("doc_id", "source", "text")
    corpusDocs(0 until 60, "join hash").coalesce(2)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val base = Search.postingsIndexDirs(spark, tmp)
    assert(base.size == 1)
    corpusDocs(10 until 12, "join join join hash").coalesce(1)
      .write.mode("append").parquet(s"$tmp/documents.parquet")
    val grown = Search.postingsIndexDirs(spark, tmp)
    assert(grown.size == 1, s"overlapping-id append must rebuild, got $grown")
    assert(grown.head != base.head)
    val viaIndex = Search.keywordSearch(spark, tmp).collect().toSet
    val brute = Search.keywordSearchBrute(spark, tmp).collect().toSet
    assert(viaIndex == brute)
  }

  test("tfidf distinctive terms rank a planted source-exclusive word first") {
    import spark.implicits._
    val tmp = tmpDir("graft_tfidf")
    // two sources share 'common'; each has an exclusive word — tf·idf
    // must rank the exclusive word above the shared one per source
    Seq(
      (1L, "alpha", "common common aardvark"),
      (2L, "alpha", "common aardvark aardvark"),
      (3L, "beta", "common common zebra"),
      (4L, "beta", "common zebra zebra"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val top = Search.tfidfTerms(spark, tmp, k = 1).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(top == Map("alpha" -> "aardvark", "beta" -> "zebra"), top.toString)
    // and the score arithmetic replays by hand: tf=3 in-source,
    // df=2 docs corpus-wide -> (3 * scale) div 2
    val row = Search.tfidfTerms(spark, tmp, k = 1)
      .filter($"source" === "alpha").collect().head
    assert(row.getLong(2) == 3L && row.getLong(3) == 2L)
    assert(row.getLong(4) == 3L * Search.TfidfScale / 2L)
  }

  test("tfidf salted pre-limit equals the degenerate single-salt window") {
    // saltSlots=1 is semantically the plain per-source window; the
    // salted path must be bit-identical (the stratifiedSample
    // exactness argument: a source-global top-k term is also its
    // salt-group's top-k)
    val salted = Search.tfidfTerms(spark, dir, saltSlots = 8).collect().toSet
    val plain = Search.tfidfTerms(spark, dir, saltSlots = 1).collect().toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }
}
