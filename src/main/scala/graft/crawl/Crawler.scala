package graft.crawl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel
import org.apache.spark.util.sketch.BloomFilter

import graft.core.{Canon, Finding, HtmlTok, Imaging, RefSim, SynthWeb}
import graft.lake.{LakeTable, RunLog}

/** Engine configuration. Conformance runs (vs RefSim) use
  * robots=false and perWaveHostQuota=None — those two are engine
  * extensions absent in the reference (SURVEY.md §2.8 D4); everything
  * else reproduces /root/reference/src/main.rs semantics. */
final case class CrawlConfig(
    web: SynthWeb.WebConfig,
    seeds: Seq[String],
    lakeRoot: String,
    depthLimit: Int = 4,          // src/main.rs:23 (default 4; vacuous for >=1)
    hostVisitLimit: Int = 256,    // src/main.rs:24 (=> 257 admissions/host)
    bloom: Boolean = true,
    bloomExpectedItems: Long = 4L * 1000 * 1000,
    bloomFpp: Double = 0.01,
    fetchPartitions: Int = 64,    // salted fetch-stage slots
    saltSlots: Int = 8,           // sub-slots one hot host spreads over
    robots: Boolean = false,      // engine extension: robots.txt cache table
    perWaveHostQuota: Option[Int] = None, // engine extension: token bucket
    maxWaves: Int = 100
)

/** One row of the frontier / admitted-wave tables. */
final case class FrontierRow(kind: String, url: String, depth: Int, host: String)

/** Output of the fetch+parse flatMap for one admitted page. */
final case class PageResult(
    purl: String, phost: String, pdepth: Int, ok: Boolean,
    children: Seq[Finding]
)

final case class ImageResult(
    image_id: String, ok: Boolean, bytes: Array[Byte], w: Int, h: Int,
    fmt: String, caption: String, phash: Long, basename: String
)

/** The Spark-native wave engine. Each crawl wave is one typed Dataset
  * transform (SURVEY.md §3.2):
  *
  *   frontier_k --window+broadcast-join--> admitted
  *     --salted mapPartitions(synthetic fetch + tokenize + canon)-->
  *   children --distinct--> candidates --bloom prefilter + left-anti(seen)-->
  *   novel --depth gate--> frontier_{k+1};  seen += novel (atomic commit)
  *
  * All coordination state the reference keeps in driver HashMaps
  * (archive, host_visits — src/main.rs:51-52) lives in lake tables, so
  * the design point is the table size, not driver memory.
  */
class Crawler(spark: SparkSession, cfg: CrawlConfig) extends Serializable {
  import spark.implicits._

  val frontierT = new LakeTable(spark, cfg.lakeRoot, "frontier")
  val seenT = new LakeTable(spark, cfg.lakeRoot, "seen")
  val budgetT = new LakeTable(spark, cfg.lakeRoot, "host_budget")
  val imagesT = new LakeTable(spark, cfg.lakeRoot, "images")
  val metricsT = new LakeTable(spark, cfg.lakeRoot, "metrics")
  val robotsT = new LakeTable(spark, cfg.lakeRoot, "robots_cache")
  val runLog = new RunLog(cfg.lakeRoot)

  /** host without port from a canonical URL — stays in codegen
    * (no UDF): scheme '://' then everything up to :, /, ?, #. */
  private def hostCol(url: org.apache.spark.sql.Column) =
    regexp_extract(url, "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)

  /** Salted fetch-stage key: hot hosts spread over saltSlots sub-slots
    * while the admission window stays host-partitioned (SURVEY.md §4). */
  private def saltedKey =
    pmod(xxhash64(col("host")), lit(cfg.fetchPartitions / math.max(1, cfg.saltSlots))) *
      lit(cfg.saltSlots) + pmod(xxhash64(col("url")), lit(cfg.saltSlots))

  // ---------------------------------------------------------------- seeds

  /** S1+S2: seeds -> canonical distinct -> wave-0 frontier. Malformed
    * seed fails the job (the reference panics, src/main.rs:301-307).
    * Seeds are NOT written to `seen` — the reference never archives
    * them (src/main.rs:87-92), so a page linking back to a seed
    * re-enqueues it once. */
  def initRun(): Long = {
    val rows = cfg.seeds.map { s =>
      val u = Canon.canonicalize(s).getOrElse(
        throw new IllegalArgumentException(s"malformed seed: $s"))
      FrontierRow(Finding.Page, u.render, 0, u.host)
    }.distinct
    val df = spark.createDataset(rows).toDF()
    frontierT.commit(0, df.repartition(1))
    budgetT.commit(0, Seq.empty[(String, Long)].toDF("host", "visits"))
    seenT.commit(0, Seq.empty[(String, String, Int, Long, Int)]
      .toDF("kind", "url", "depth", "url_hash", "wave_added"))
    if (cfg.robots) robotsT.commit(0, Seq.empty[(String, Seq[String])].toDF("host", "disallow"))
    runLog.markComplete(0, Map("frontier" -> rows.size.toLong))
    rows.size.toLong
  }

  // ----------------------------------------------------------- one wave

  /** Runs wave k: consumes frontier_k, commits frontier_{k+1} and the
    * wave's appends to seen/budget/images/metrics. Returns the size of
    * the next frontier. */
  def runWave(wave: Int, bloomState: BloomState): Long = {
    val sc = spark.sparkContext
    val webCfg = cfg.web
    val depthLimit = cfg.depthLimit
    val visitLimit = cfg.hostVisitLimit

    val frontier = frontierT.readWave(wave)
    val budget = budgetT.readWave(wave)

    // --- engine extension: robots.txt cache + filter (OFF in conformance)
    val (afterRobots, robotsDropped) =
      if (!cfg.robots) (frontier, spark.emptyDataFrame)
      else applyRobots(wave, frontier)

    // --- A3 + J2: budget-capped admission.
    // row_number per host in canonical (kind,url,depth) order — the
    // fixed linearization shared with RefSim (SURVEY.md §3.4); broadcast
    // the budget (bounded by #hosts, tiny next to the frontier).
    val w = Window.partitionBy($"host").orderBy($"kind", $"url", $"depth")
    val ranked = afterRobots
      .filter($"host" =!= "")                              // P2 null-host drop
      .withColumn("rn", row_number().over(w))
      .join(broadcast(budget), Seq("host"), "left")
      .na.fill(0L, Seq("visits"))
    val quotaFilter = cfg.perWaveHostQuota
      .map(q => $"rn" <= q).getOrElse(lit(true))           // token bucket (ext.)
    val admitted = ranked
      .filter($"visits" + $"rn" <= lit(visitLimit + 1) && quotaFilter)
      .select($"kind", $"url", $"depth", $"host")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val admittedCount = admitted.count() // materializes the cache

    // --- A2: merge admitted counts into the budget table (full rewrite;
    // the table is <= #hosts rows).
    val newBudget = budget.unionByName(
        admitted.groupBy($"host").agg(count(lit(1)).as("visits")))
      .groupBy($"host").agg(sum($"visits").as("visits"))
    budgetT.commit(wave + 1, newBudget.coalesce(1))

    // --- S3+M1..M5: fetch + tokenize + resolve, salted by host-hash.
    val pages = admitted.filter($"kind" === Finding.Page)
      .repartition(cfg.fetchPartitions, saltedKey)
      .as[FrontierRow]
    val parsed: Dataset[PageResult] = pages.mapPartitions { it =>
      it.map { r =>
        SynthWeb.fetch(r.url, webCfg) match {
          case SynthWeb.PageBody(html) =>
            PageResult(r.url, r.host, r.depth, ok = true,
              RefSim.processPage(r.url, html, r.depth).toSeq)
          case _ => PageResult(r.url, r.host, r.depth, ok = false, Seq.empty)
        }
      }
    }.persist(StorageLevel.MEMORY_AND_DISK)

    // --- U1: children across all pages; M4 per-page dedup already done
    // in processPage's Set. gate_depth = depth of the first parent in
    // canonical response order (only matters when depths differ, which
    // the reference's no-increment quirk makes impossible in practice).
    val children = parsed.flatMap { p =>
      p.children.map(c => (c.kind, c.url, c.depth, p.pdepth, p.phost, p.purl))
    }.toDF("kind", "url", "depth", "pdepth", "phost", "purl")
    val cands = children
      .groupBy($"kind", $"url", $"depth")
      .agg(
        min_by($"pdepth", struct($"phost", $"purl")).as("gate_depth"),
        count(lit(1)).as("refs"))
      .withColumn("url_hash", xxhash64($"kind", $"url", $"depth"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // --- J1 (+A4): novelty = candidates minus seen. The partitioned
    // Bloom pre-filter routes definitely-new rows around the anti-join;
    // only maybe-seen rows probe the exact seen table, so the join's
    // probe side shrinks to ~|actually seen| + FP.
    // readThrough(wave), NOT readAll(): after a mid-wave crash the lake
    // may hold a torn wave+1 snapshot; scoping the read to the waves the
    // run log marked complete keeps the re-run byte-identical
    val seen = seenT.readThrough(wave).select($"kind", $"url", $"depth")
    val novel0 = bloomState.filter match {
      case Some(bf) if cfg.bloom =>
        val bfB = sc.broadcast(bf)
        val maybeSeen = udf((h: Long) => bfB.value.mightContainLong(h))
        val definitelyNew = cands.filter(!maybeSeen($"url_hash"))
        val checked = cands.filter(maybeSeen($"url_hash"))
          .join(seen, Seq("kind", "url", "depth"), "left_anti")
        definitelyNew.unionByName(checked)
      case _ =>
        cands.join(seen, Seq("kind", "url", "depth"), "left_anti")
    }
    val novel = novel0.persist(StorageLevel.MEMORY_AND_DISK)

    // --- commit seen += novel (ALL novel rows are archived, even those
    // the depth gate keeps out of the queue — src/main.rs:130-134).
    val seenSnap = seenT.commit(wave + 1, novel
      .select($"kind", $"url", $"depth", $"url_hash", lit(wave + 1).as("wave_added"))
      .repartition(col("url_hash")))
    // spark's bloomFilter() NPEs on an empty input; footer count is free
    if (cfg.bloom && seenSnap.totalRows > 0) bloomState.merge(novel, spark)

    // --- D2 depth gate -> frontier_{k+1}
    val nextFrontier = novel
      .filter($"gate_depth" < depthLimit)
      .select($"kind", $"url", $"depth", hostCol($"url").as("host"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    frontierT.commit(wave + 1, nextFrontier)

    // --- S4+S5: image fetch into the images table (input_hint schema).
    val images = admitted.filter($"kind" === Finding.Image)
      .repartition(cfg.fetchPartitions, saltedKey)
      .as[FrontierRow]
    val fetchedImages = images.mapPartitions { it =>
      it.map { r =>
        SynthWeb.fetch(r.url, webCfg) match {
          case SynthWeb.ImageBody(bytes, iw, ih, fmt) =>
            val decoded = Imaging.decode(bytes)
            val base = r.url.substring(r.url.lastIndexOf('/') + 1)
            ImageResult(r.url, ok = true, bytes, iw, ih, fmt,
              SynthWeb.caption(r.url), Imaging.aHash(decoded), base)
          case _ =>
            ImageResult(r.url, ok = false, Array.emptyByteArray, 0, 0, "", "", 0L, "")
        }
      }
    }.persist(StorageLevel.MEMORY_AND_DISK)
    imagesT.commit(wave + 1, fetchedImages.filter($"ok")
      .select($"image_id", $"bytes", $"w", $"h", $"fmt", $"caption", $"phash", $"basename"))

    // --- per-wave, per-host-bucket metrics (lineage beyond the
    // manifests' per-file row counts).
    val bucket = pmod(xxhash64(col("host")), lit(32)).cast("int").as("host_bucket")
    def perBucket(df: DataFrame, name: String): DataFrame =
      df.groupBy(bucket).agg(count(lit(1)).as(name))
    val candB = perBucket(frontier, "candidates")
    val admB = perBucket(admitted, "admitted")
    val fetchB = parsed.toDF().groupBy(pmod(xxhash64(col("phost")), lit(32)).cast("int").as("host_bucket"))
      .agg(sum(when($"ok", 1L).otherwise(0L)).as("fetch_ok"),
           sum(when($"ok", 0L).otherwise(1L)).as("fetch_err"))
    val novelB = novel.groupBy(pmod(xxhash64(hostCol($"url")), lit(32)).cast("int").as("host_bucket"))
      .agg(count(lit(1)).as("novel"), sum($"refs" - 1).as("dup_dropped"))
    val imgB = fetchedImages.filter($"ok")
      .groupBy(pmod(xxhash64(hostCol($"image_id")), lit(32)).cast("int").as("host_bucket"))
      .agg(count(lit(1)).as("images_written"))
    val metrics = candB
      .join(admB, Seq("host_bucket"), "full")
      .join(fetchB, Seq("host_bucket"), "full")
      .join(novelB, Seq("host_bucket"), "full")
      .join(imgB, Seq("host_bucket"), "full")
      .na.fill(0L)
      .withColumn("budget_dropped", $"candidates" - $"admitted")
      .withColumn("wave", lit(wave))
    metricsT.commit(wave + 1, metrics.coalesce(1))

    val nextCount = frontierT.snapshot(wave + 1).get.totalRows
    runLog.markComplete(wave + 1, Map(
      "frontier" -> nextCount,
      "admitted" -> admittedCount,
      "novel" -> seenT.snapshot(wave + 1).get.totalRows,
      "images" -> imagesT.snapshot(wave + 1).get.totalRows))

    admitted.unpersist(false); parsed.unpersist(false); cands.unpersist(false)
    novel.unpersist(false); nextFrontier.unpersist(false); fetchedImages.unpersist(false)
    nextCount
  }


  /** Engine extension D4: consult/populate the robots cache table and
    * drop disallowed URLs BEFORE budget admission. */
  private def applyRobots(wave: Int, frontier: DataFrame): (DataFrame, DataFrame) = {
    val cache = robotsT.readAll()
    val newHosts = frontier.select($"host").distinct()
      .join(cache.select($"host"), Seq("host"), "left_anti")
      .as[String].collect()
    val fetched = newHosts.toSeq.map(h => (h, SynthWeb.robots(h)))
    robotsT.commit(wave + 1, fetched.toDF("host", "disallow"))
    val allRules = robotsT.readAll()
    val pathCol = regexp_replace($"url", "^[a-z][a-z0-9+.-]*://[^/]*", "")
    val joined = frontier.join(broadcast(allRules), Seq("host"), "left")
      .withColumn("path", pathCol)
      .withColumn("blocked",
        coalesce(exists($"disallow", p => startswith($"path", p)), lit(false)))
    val allowed = joined.filter(!$"blocked").select($"kind", $"url", $"depth", $"host")
    val dropped = joined.filter($"blocked").select($"kind", $"url", $"depth", $"host")
    (allowed, dropped)
  }

  // ------------------------------------------------------------- driver

  /** Full run (or resume). The loop is thin: per wave one transform,
    * counts come from parquet footers (no collect of data). */
  def run(): CrawlSummary = {
    val bloomState = new BloomState(cfg)
    val startWave = runLog.lastCompleteWave match {
      case None =>
        initRun(); 0
      case Some(k) =>
        // resume: rebuild the bloom from the COMPLETE waves only (a torn
        // wave k+1 snapshot must not leak into wave k's re-run)
        if (cfg.bloom && seenT.rowCountThrough(k) > 0)
          bloomState.rebuildFrom(seenT.readThrough(k), spark)
        k
    }
    var wave = startWave
    var frontierSize = frontierT.snapshot(wave).get.totalRows
    while (frontierSize > 0 && wave < cfg.maxWaves) {
      frontierSize = runWave(wave, bloomState)
      wave += 1
    }
    CrawlSummary(wave, seenT.rowCountThrough(wave), imagesT.rowCountThrough(wave))
  }
}

final case class CrawlSummary(waves: Int, seenRows: Long, imageRows: Long)

/** Driver-held running Bloom filter over url_hash — mergeable across
  * waves (built per wave over just the novel rows, unioned in place),
  * used only as a pre-filter; the exact anti-join stays authoritative
  * so FPs can never corrupt the URL-seen set (SURVEY.md §2.4 A4). */
class BloomState(cfg: CrawlConfig) extends Serializable {
  @transient var filter: Option[BloomFilter] = None

  def merge(novel: DataFrame, spark: SparkSession): Unit = {
    val bf = novel.stat.bloomFilter("url_hash", cfg.bloomExpectedItems, cfg.bloomFpp)
    filter match {
      case Some(f) => f.mergeInPlace(bf)
      case None    => filter = Some(bf)
    }
  }

  def rebuildFrom(seen: DataFrame, spark: SparkSession): Unit = {
    filter = Some(seen.stat.bloomFilter("url_hash", cfg.bloomExpectedItems, cfg.bloomFpp))
  }
}
