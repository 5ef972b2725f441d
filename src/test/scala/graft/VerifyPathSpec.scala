package graft

import org.apache.spark.sql.{DataFrame, Row}

/** The r4 CORRECTNESS failure class: an operator whose `collect()` is
  * right but whose result CHANGES under the driver's actual execution
  * path — Verify writes every query via `.coalesce(1).write.parquet`
  * (`Verify.scala`), and a coalesce collapses narrow pipelines, so any
  * operator keying on task ids / partition placement silently corrupts
  * there while OpsSpec (collect-based) and PlanSpec (explain-based)
  * both stay green. `q_sequence_packing` shipped exactly this bug in
  * r4.
  *
  * This gate runs EVERY `SparkEntry.queries` entry once, then asserts
  * the coalesce(1)-write-then-read row multiset equals the collect()
  * row multiset, in a session running at 32 shuffle partitions (the
  * driver runs wider than the 8-partition test default — misalignment
  * between partition count and data layout is what exposes the class).
  */
class VerifyPathSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  /** Rows → canonical comparable multiset: byte arrays and nested
    * arrays to immutable vectors, then a stable sort. */
  private def canon(rows: Array[Row]): Seq[Seq[Any]] = {
    def norm(v: Any): Any = v match {
      case b: Array[Byte]  => b.toVector
      case a: Array[_]     => a.toVector.map(norm)
      case s: scala.collection.Seq[_] => s.toVector.map(norm)
      case r: Row          => r.toSeq.map(norm)
      case x               => x
    }
    rows.toSeq.map(_.toSeq.map(norm)).sortBy(_.toString())
  }

  private def assertWritePathParity(name: String, df: DataFrame, out: String): Unit = {
    val collected = canon(df.collect())
    df.coalesce(1).write.mode("overwrite").parquet(out)
    val written = canon(df.sparkSession.read.parquet(out).collect())
    assert(written == collected,
      s"$name: coalesce(1).write path diverges from collect() " +
        s"(${written.size} vs ${collected.size} rows)")
  }

  test("every query: driver write path (coalesce(1).write) ≡ collect at 32 shuffle partitions") {
    val ns = spark.newSession()
    ns.conf.set("spark.sql.shuffle.partitions", "32")
    val outRoot = tmpDir("graft_verify_path")
    SparkEntry.queries.foreach { case (name, fn) =>
      // one invocation per query: the DF is reused for both paths (the
      // crawl smoke runs its crawl inside fn — invoking twice would
      // crawl twice and, worse, compare two different lakes)
      val df = fn(ns, sfDir)
      assertWritePathParity(name, df, s"$outRoot/$name")
    }
  }

  test("sequence packing survives the write path when range bounds split sources") {
    // 16 range partitions over 20 × 25-doc sources: sampled bounds land
    // mid-source, so phase-2 offsets are exercised for continuation
    // chunks — the configuration where the r4 TaskContext.getPartitionId
    // keying returned 0 for every merged task and restarted each
    // source's prefix sum at old partition boundaries. The windowed
    // formulation is the semantic oracle.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val ns = spark.newSession()
    ns.conf.set("spark.sql.shuffle.partitions", "32")
    import ns.implicits._
    // non-vacuity: the 16-way range layout must actually split at least
    // one source across partitions, or this test degenerates into the
    // aligned case that masked the r4 bug
    val layout = ns.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"source")
      .repartitionByRange(16, $"source", $"doc_id")
      .sortWithinPartitions($"source", $"doc_id")
      .select($"source").as[String]
      .mapPartitions(it => if (it.hasNext) { val s = it.toSeq; Iterator((s.head, s.last)) } else Iterator.empty)
      .collect()
    val splitSources = layout.sliding(2).count {
      case Array((_, lastOfP), (firstOfNext, _)) => lastOfP == firstOfNext
      case _ => false
    }
    assert(splitSources > 0, "range bounds aligned with source boundaries — test would be vacuous")
    val out = tmpDir("graft_seqpack") + "/packed"
    graft.ops.TextOps.sequencePacking(ns, sfDir, numParts = 16)
      .coalesce(1).write.mode("overwrite").parquet(out)
    val got = canon(ns.read.parquet(out).collect())
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = canon(ns.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"source",
        size(split(trim($"text"), "\\s+")).cast("bigint").as("n_tokens"))
      .withColumn("start_offset", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .select($"doc_id", $"source", $"n_tokens", $"start_offset",
        shiftright($"start_offset", graft.ops.TextOps.SeqLenBits).as("seq_first"),
        shiftright($"start_offset" + $"n_tokens" - 1, graft.ops.TextOps.SeqLenBits).as("seq_last"))
      .collect())
    assert(got == want, s"sequence packing write path diverged: ${got.size} vs ${want.size} rows")
  }
}
