package graft.crawl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

import graft.core.{Canon, Finding, HtmlTok, Imaging, PageKernel, SynthWeb}
import graft.lake.{BucketedLakeTable, LakeTable, RunLog}

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
    seenBuckets: Int = 32,        // seen-table hash buckets (= bloom shards)
    admitPreLimit: Boolean = true, // budget-aware pre-limit before the window
    // engage the pre-limit only when the wave's frontier is big enough
    // that one viral host's window partition could actually straggle;
    // below this the pre-limit's extra exchange costs more than the
    // single-task sort it avoids (measured: ~25% admit overhead at
    // sandbox sizes). 0 forces it on (specs + conformance do this).
    admitPreLimitMinRows: Long = 4L * 1000 * 1000,
    fetchPartitions: Int = 64,    // salted fetch-stage slots
    saltSlots: Int = 8,           // sub-slots one hot host spreads over
    robots: Boolean = false,      // engine extension: robots.txt cache table
    perWaveHostQuota: Option[Int] = None, // engine extension: token bucket
    // broadcast the budget only while it's small: at 10^7+ hosts the
    // per-wave broadcast (hundreds of MB, deserialized on every
    // executor) and the repartition(1) budget rewrite both become the
    // wave's fixed cost. Above this row count the budget joins as a
    // plain shuffled join (the admission window shuffles by host
    // anyway, so the extra exchange is only the budget's own) and the
    // rewrite spreads over seenBuckets host-hashed files.
    budgetBroadcastMaxRows: Long = 4L * 1000 * 1000,
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
object Crawler {
  /** Fixed observability granularity of the per-wave metrics rows —
    * independent of the storage bucketing (seenBuckets), which is a
    * layout knob; metrics stay comparable across configs. */
  val MetricsHostBuckets = 32
}

class Crawler(spark: SparkSession, cfg: CrawlConfig) extends Serializable {
  import spark.implicits._

  // saltSlots > fetchPartitions would make the salted key a
  // pmod-by-zero (ANSI: DIVIDE_BY_ZERO at runtime; non-ANSI: null keys
  // collapsing the fetch stage into one partition) - reject up front
  require(cfg.saltSlots >= 1 && cfg.saltSlots <= cfg.fetchPartitions,
    s"saltSlots (${cfg.saltSlots}) must be in [1, fetchPartitions=${cfg.fetchPartitions}]")

  val frontierT = new LakeTable(spark, cfg.lakeRoot, "frontier")
  // seen is hash-BUCKETED on the dedup key (SURVEY.md §2.5 J1): the
  // cumulative URL-seen set is never re-shuffled by the per-wave
  // anti-join — its scan reports the bucket partitioning and only the
  // wave's candidates are exchanged (PlanSpec asserts this).
  val seenT = new BucketedLakeTable(spark, cfg.lakeRoot, "seen",
    "kind STRING, url STRING, depth INT, url_hash BIGINT",
    Seq("kind", "url", "depth"), cfg.seenBuckets)
  val budgetT = new LakeTable(spark, cfg.lakeRoot, "host_budget")
  val imagesT = new LakeTable(spark, cfg.lakeRoot, "images")
  val metricsT = new LakeTable(spark, cfg.lakeRoot, "metrics")
  val robotsT = new LakeTable(spark, cfg.lakeRoot, "robots_cache")
  val runLog = new RunLog(cfg.lakeRoot)

  /** host without port from a canonical URL — stays in codegen
    * (no UDF): scheme '://' then a bracketed IPv6 literal or everything
    * up to :, /, ?, # (mirrors Canon.hostOf on canonical urls). */
  private def hostCol(url: org.apache.spark.sql.Column) =
    regexp_extract(url, "^[a-z][a-z0-9+.-]*://(\\[[^\\]]*\\]|[^/:?#]+)", 1)

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
    seenT.init()
    if (cfg.robots) robotsT.commit(0, Seq.empty[(String, Seq[String])].toDF("host", "disallow"))
    runLog.markComplete(0, Map("frontier" -> rows.size.toLong))
    rows.size.toLong
  }

  // ----------------------------------------------------------- one wave

  /** Runs wave k: consumes frontier_k, commits frontier_{k+1} and the
    * wave's appends to seen/budget/images/metrics. Returns the size of
    * the next frontier. */
  private val verbose = sys.env.contains("GRAFT_WAVE_TIMING")
  private def timed[T](wave: Int, name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    if (verbose) println(f"[wave $wave] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  def runWave(wave: Int, bloomState: PartitionedBloom): Long = {
    val waveT0 = System.nanoTime()
    val sc = spark.sparkContext
    val webCfg = cfg.web
    val depthLimit = cfg.depthLimit
    val visitLimit = cfg.hostVisitLimit

    val frontier = frontierT.readWave(wave)
    val budget = budgetT.readWave(wave)

    // --- engine extension: robots.txt cache + filter (OFF in conformance)
    val (afterRobots, robotsDropped) =
      if (!cfg.robots) (frontier, frontier.limit(0))
      else applyRobots(wave, frontier)

    // --- A3 + J2: budget-capped admission.
    // row_number per host in canonical (kind,url,depth) order — the
    // fixed linearization shared with RefSim (SURVEY.md §3.4); broadcast
    // the budget (bounded by #hosts, tiny next to the frontier).
    // adaptive dim-join strategy (see CrawlConfig.budgetBroadcastMaxRows)
    val budgetRows = budgetT.snapshot(wave).map(_.totalRows).getOrElse(0L)
    val smallBudget = budgetRows <= cfg.budgetBroadcastMaxRows
    val base = afterRobots
      .filter($"host" =!= "")                              // P2 null-host drop
      .join(if (smallBudget) broadcast(budget) else budget, Seq("host"), "left")
      .na.fill(0L, Seq("visits"))
    // Budget-aware PRE-LIMIT (SURVEY.md §7 hard part 5): a hot host's
    // candidates would otherwise all land in ONE window partition (the
    // wave's straggler at 100x). Within salted (host, psalt) partitions
    // keep only each host's `remaining`-smallest rows in canonical
    // order first — exact, because any row in the host's global top-r
    // is also in its salt-group's top-r — so the global window sees at
    // most saltSlots * remaining rows per host (AdmissionSpec asserts
    // the bound AND exactness). Engaged adaptively: the frontier row
    // count is free (snapshot footers), and below admitPreLimitMinRows
    // the single-task sort it avoids is cheaper than its extra exchange.
    val frontierRows = frontierT.snapshot(wave).map(_.totalRows).getOrElse(Long.MaxValue)
    val preLimited =
      if (!cfg.admitPreLimit || frontierRows < cfg.admitPreLimitMinRows) base
      else Admission.preLimit(base, visitLimit, cfg.saltSlots)
    val w = Window.partitionBy($"host").orderBy($"kind", $"url", $"depth")
    val ranked = preLimited.withColumn("rn", row_number().over(w))
    val quotaFilter = cfg.perWaveHostQuota
      .map(q => $"rn" <= q).getOrElse(lit(true))           // token bucket (ext.)
    val admitted = ranked
      .filter($"visits" + $"rn" <= lit(visitLimit + 1) && quotaFilter)
      .select($"kind", $"url", $"depth", $"host")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val admittedCount = timed(wave, "admit+count")(admitted.count()) // materializes the cache

    // target ~128k rows per committed file (64-file cap); admitted is
    // cached, so the
    // budget, pages and images chains below run CONCURRENTLY
    // (independent jobs on the shared scheduler), shortening the wave's
    // fixed-cost path to the slowest chain.
    def nFiles(rows: Long): Int = math.max(1, math.min(64, (rows / 131072L + 1L).toInt))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global

    // --- A2: merge admitted counts into the budget table (full rewrite;
    // the table is <= #hosts rows).
    val budgetChain = Future {
      val newBudget = budget.unionByName(
          admitted.groupBy($"host").agg(count(lit(1)).as("visits")))
        .groupBy($"host").agg(sum($"visits").as("visits"))
      // repartition(1), NOT coalesce(1): coalesce propagates up and would
      // run the whole aggregation single-task at any core count; a big
      // (10^7-host) budget instead spreads over host-hashed files
      val out =
        if (smallBudget) newBudget.repartition(1)
        else newBudget.repartition(cfg.seenBuckets, $"host")
      timed(wave, "budget_commit")(budgetT.commit(wave + 1, out))
    }

    // ====================== pages chain ======================
    val pagesChain = Future {
      // --- S3+M1..M5: fetch + tokenize + resolve, salted by host-hash.
      val pages = admitted.filter($"kind" === Finding.Page)
        .repartition(cfg.fetchPartitions, saltedKey)
        .as[FrontierRow]
      // fetchFollowing mirrors reqwest's <=10-redirect follow; links
      // resolve against the REQUEST url r.url (pre-redirect), exactly
      // the reference's quirk (src/main.rs:157,163-164)
      val parsed: Dataset[PageResult] = pages.mapPartitions { it =>
        it.map { r =>
          SynthWeb.fetchFollowing(r.url, webCfg) match {
            case SynthWeb.PageBody(html) =>
              PageResult(r.url, r.host, r.depth, ok = true,
                PageKernel.processPage(r.url, html, r.depth).toSeq)
            case _ => PageResult(r.url, r.host, r.depth, ok = false, Seq.empty)
          }
        }
      }.persist(StorageLevel.MEMORY_AND_DISK)

      // PIPELINE with the previous wave: the fetch+parse job depends
      // only on THIS wave's admission — not on the previous wave's seen
      // append / bloom merge, which may still be committing. Warm the
      // parsed cache now; the anti-join below (which DOES need them)
      // joins `seenReady` first. This overlaps the longest stage of
      // wave k+1 with the commit tail of wave k — at high core counts
      // that tail is the non-scaling wave cost.
      timed(wave, "fetch")(parsed.count())
      Await.result(seenReady, Duration.Inf)

      // --- U1: children across all pages; M4 per-page dedup already done
      // in processPage's Set. gate_depth = depth of the first parent in
      // canonical response order (only matters when depths differ, which
      // the reference's no-increment quirk makes impossible in practice).
      val children = parsed.flatMap { p =>
        p.children.map(c => (c.kind, c.url, c.depth, p.pdepth, p.phost, p.purl))
      }.toDF("kind", "url", "depth", "pdepth", "phost", "purl")
      // repartition(seenBuckets, dedup key): every downstream stage —
      // bloom probe, anti-join against the bucketed seen scan, and the
      // bucketed seen WRITE — reuses this one candidate shuffle; each
      // write task holds exactly one bucket (no small-file explosion).
      val cands = children
        .groupBy($"kind", $"url", $"depth")
        .agg(
          min_by($"pdepth", struct($"phost", $"purl")).as("gate_depth"),
          count(lit(1)).as("refs"))
        .withColumn("url_hash", xxhash64($"kind", $"url", $"depth"))
        .withColumn("bucket", bloomState.bucketCol($"kind", $"url", $"depth"))
        .repartition(cfg.seenBuckets, $"kind", $"url", $"depth")
        .persist(StorageLevel.MEMORY_AND_DISK) // both bloom branches read it

      // --- J1 (+A4): novelty = candidates minus seen. The partitioned
      // Bloom pre-filter routes definitely-new rows around the anti-join
      // (codegen might_contain, one bucket probe per row); only
      // maybe-seen rows probe the exact bucketed seen table, which is
      // scanned storage-partitioned — never shuffled.
      // readThrough(wave), NOT readAll(): after a mid-wave crash the lake
      // may hold a torn wave+1 snapshot; scoping the read to the waves the
      // run log marked complete keeps the re-run byte-identical.
      val seen = seenT.readThrough(wave).select($"kind", $"url", $"depth")
      val novel0 =
        if (cfg.bloom && !bloomState.isEmpty) {
          val probe = bloomState.probeCol(spark, $"bucket", $"url_hash")
          val definitelyNew = cands.filter(!probe)
          val checked = cands.filter(probe)
            .join(seen, Seq("kind", "url", "depth"), "left_anti")
          definitelyNew.unionByName(checked)
        } else if (wave == 0) cands // seen is empty before the first commit
        else cands.join(seen, Seq("kind", "url", "depth"), "left_anti")
      val novel = novel0.persist(StorageLevel.MEMORY_AND_DISK)
      val novelCount = timed(wave, "novel")(novel.count())

      // novel is cached: the seen append, bloom merge, and frontier
      // commit are independent reads of it — run them concurrently.
      // --- commit seen += novel (ALL novel rows are archived, even those
      // the depth gate keeps out of the queue — src/main.rs:130-134).
      // The insert inherits the candidates' bucket-aligned partitioning.
      val fSeen = Future {
        timed(wave, "seen_commit")(seenT.commit(wave + 1, novel
          .select($"kind", $"url", $"depth", $"url_hash", lit(wave + 1).as("wave_added"))))
      }
      val fBloom =
        if (!cfg.bloom || novelCount == 0) scala.concurrent.Future.unit
        else if (!bloomState.wouldSaturate(novelCount)) Future {
          timed(wave, "bloom_merge")(
            bloomState.add(novel, $"bucket", $"url_hash", novelCount))
        } else fSeen.map { _ =>
          // capacity crossing: grow and REBUILD from the full committed
          // seen set (one distributed aggregation, same shape as the
          // per-wave merge) — runs after this wave's seen append so the
          // rebuilt filters cover it. Without this, fixed-size filters
          // saturate at the 10^10 design point and the pre-filter
          // silently degrades to all-pass.
          timed(wave, "bloom_rebuild") {
            val total = seenT.rowCountThrough(wave + 1)
            bloomState.growTo(total)
            val all = seenT.readThrough(wave + 1)
            bloomState.add(all,
              bloomState.bucketCol($"kind", $"url", $"depth"), $"url_hash", total)
          }
        }
      // --- D2 depth gate -> frontier_{k+1}
      val fFrontier = Future {
        val nextFrontier = novel
          .filter($"gate_depth" < depthLimit)
          .select($"kind", $"url", $"depth", hostCol($"url").as("host"))
        timed(wave, "frontier_commit")(
          frontierT.commit(wave + 1, nextFrontier.coalesce(nFiles(novelCount))))
      }
      // the seen append + bloom merge escape this wave: the NEXT wave's
      // anti-join awaits them (seenReady) right before it needs them,
      // so its admission + fetch overlap this commit tail
      seenReady = for { _ <- fSeen; _ <- fBloom } yield ()
      Await.result(fFrontier, Duration.Inf)
      // cands is released in the wave TAIL, not here: fSeen/fBloom have
      // escaped this wave and a novel partition whose cached block fell
      // back recomputes THROUGH cands — unpersisting on this thread
      // races that read (observed once as a mid-read
      // "Block rdd_N does not exist" under a concurrent full suite)
      (parsed, novel, cands)
    }

    // ====================== images chain ======================
    val imagesChain = Future {
      // --- S4+S5: image fetch into the images table (input_hint schema).
      val images = admitted.filter($"kind" === Finding.Image)
        .repartition(cfg.fetchPartitions, saltedKey)
        .as[FrontierRow]
      val fetchedImages = images.mapPartitions { it =>
        it.map { r =>
          SynthWeb.fetchFollowing(r.url, webCfg) match {
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
      // PNG/JPEG payloads are already entropy-coded — snappy on top only
      // burns CPU, so the images table is written uncompressed
      timed(wave, "images_commit")(imagesT.commit(wave + 1, fetchedImages.filter($"ok")
        .select($"image_id", $"bytes", $"w", $"h", $"fmt", $"caption", $"phash", $"basename"),
        writeOptions = Map("compression" -> "uncompressed")))
      fetchedImages
    }

    val (parsed, novel, cands) = Await.result(pagesChain, Duration.Inf)
    val fetchedImages = Await.result(imagesChain, Duration.Inf)
    Await.result(budgetChain, Duration.Inf) // next wave reads budget_{k+1}
    val readyThisWave = seenReady           // seen+bloom tail of THIS wave
    val nextCount = frontierT.snapshot(wave + 1).get.totalRows
    val imageRows = imagesT.snapshot(wave + 1).get.totalRows

    // --- per-wave, per-host-bucket metrics (lineage beyond the
    // manifests' per-file row counts): ONE job — raw (bucket, metric,
    // value) rows unioned from the cached stages, aggregated with
    // map-side combine into the pivoted metrics row per bucket.
    // Committed ASYNCHRONOUSLY (chained, so run-log marks stay ordered):
    // metrics are outputs, never inputs of a wave, so the next wave's
    // compute overlaps this commit; run()/awaitQuiesce joins the tail.
    def b(c: org.apache.spark.sql.Column) =
      pmod(xxhash64(c), lit(Crawler.MetricsHostBuckets)).cast("int")
    val raw = frontier.select(b($"host").as("hb"), lit("candidates").as("m"), lit(1L).as("v"))
      .unionByName(admitted.select(b($"host").as("hb"), lit("admitted").as("m"), lit(1L).as("v")))
      .unionByName(parsed.toDF().select(b($"phost").as("hb"),
        when($"ok", "fetch_ok").otherwise("fetch_err").as("m"), lit(1L).as("v")))
      .unionByName(novel.select(b(hostCol($"url")).as("hb"), lit("novel").as("m"), lit(1L).as("v")))
      .unionByName(novel.select(b(hostCol($"url")).as("hb"), lit("dup_dropped").as("m"),
        ($"refs" - 1).cast("long").as("v")))
      .unionByName(fetchedImages.filter($"ok").select(b(hostCol($"image_id")).as("hb"),
        lit("images_written").as("m"), lit(1L).as("v")))
      .unionByName(robotsDropped.select(b($"host").as("hb"),
        lit("robots_dropped").as("m"), lit(1L).as("v")))
    def m(name: String) = sum(when($"m" === name, $"v").otherwise(0L)).as(name)
    val metrics = raw.groupBy($"hb".as("host_bucket"))
      .agg(m("candidates"), m("admitted"), m("fetch_ok"), m("fetch_err"),
        m("novel"), m("dup_dropped"), m("images_written"), m("robots_dropped"))
      // robots-blocked rows never reached the budget window - without
      // the subtraction they were misreported as budget drops
      .withColumn("budget_dropped", $"candidates" - $"admitted" - $"robots_dropped")
      .withColumn("wave", lit(wave))
    val waveWallMs = (System.nanoTime() - waveT0) / 1000000L
    val prevTail = pendingTail
    // the run-log mark (the resume contract: wave complete <=> ALL its
    // table snapshots landed) and the cache releases must wait for the
    // escaped seen+bloom commits of this wave too
    pendingTail = for { _ <- prevTail; _ <- readyThisWave } yield {
      // cands releases FIRST in the tail — readyThisWave means its only
      // escaped readers (seen append + bloom merge) are done, and
      // sequencing the release BEFORE the metrics job launches keeps the
      // unpersist from racing an in-flight read (the r5 "Block rdd_N
      // does not exist" fix). Holding it past the metrics commit instead
      // kept wave k's candidate cache alive into wave k+1's fetch and
      // heap-OOM'd the 10k-host scale probe at wave 4 (metrics reads
      // admitted/parsed/novel/fetchedImages, never cands — an evicted
      // novel block recomputing THROUGH the now-uncached cands is a
      // clean recompute, not a race).
      cands.unpersist(false)
      timed(wave, "metrics_commit")(metricsT.commit(wave + 1, metrics.repartition(1)))
      runLog.markComplete(wave + 1, Map(
        "frontier" -> nextCount,
        "admitted" -> admittedCount,
        "novel" -> seenT.snapshot(wave + 1).get.totalRows,
        "images" -> imageRows,
        "wall_ms" -> waveWallMs,
        // bloom fill observability: capacity vs items quantifies how
        // far the pre-filter is from its next adaptive rebuild
        "bloom_capacity" -> (if (cfg.bloom) bloomState.capacity else 0L),
        "bloom_items" -> (if (cfg.bloom) bloomState.itemsAdded else 0L)))
      admitted.unpersist(false); parsed.unpersist(false)
      novel.unpersist(false); fetchedImages.unpersist(false)
    }
    nextCount
  }

  // async tail of metrics commits + run-log marks, chained to stay ordered
  @transient private var pendingTail: scala.concurrent.Future[Unit] =
    scala.concurrent.Future.unit
  // the current wave's escaped seen-append + bloom-merge: the next
  // wave's anti-join joins this right before it needs them, letting its
  // admission + fetch overlap this wave's commit tail
  @transient private var seenReady: scala.concurrent.Future[Unit] =
    scala.concurrent.Future.unit

  /** Join the async metrics/run-log tail (call before reading final
    * state or abandoning the Crawler). */
  def awaitQuiesce(): Unit =
    scala.concurrent.Await.result(pendingTail, scala.concurrent.duration.Duration.Inf)


  /** Engine extension D4: consult/populate the robots cache table and
    * drop disallowed URLs BEFORE budget admission. The robots fetch for
    * new hosts runs INSIDE executors (mapPartitions over the
    * host-distinct Dataset) — at web scale (10^7+ hosts) a driver-side
    * collect+loop would serialize the wave. */
  private def applyRobots(wave: Int, frontier: DataFrame): (DataFrame, DataFrame) = {
    // readThrough(wave), NOT readAll: after a mid-wave crash the torn
    // robots snapshot wave+1 may hold the crashed attempt's rows — a
    // readAll cache would treat those hosts as known, fetch nothing,
    // and the overwrite commit below would then DELETE their rules
    // (the resumed run would crawl disallowed URLs). Scoping to the
    // complete waves refetches them and the commit stays idempotent.
    val cache = robotsT.readThrough(wave)
    val fetched = frontier.select($"host").distinct()
      .join(cache.select($"host"), Seq("host"), "left_anti")
      .as[String]
      .mapPartitions(_.map(h => (h, SynthWeb.robots(h))))
      .toDF("host", "disallow")
    robotsT.commit(wave + 1, fetched.repartition(1))
    val allRules = robotsT.readThrough(wave + 1)
    // same adaptive dim-join rule as the budget: per-host rules stop
    // broadcasting once the host space outgrows the threshold
    val rulesJoin =
      if (robotsT.rowCountThrough(wave + 1) <= cfg.budgetBroadcastMaxRows)
        broadcast(allRules)
      else allRules
    val pathCol = regexp_replace($"url", "^[a-z][a-z0-9+.-]*://[^/]*", "")
    val joined = frontier.join(rulesJoin, Seq("host"), "left")
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
    val bloomState = new PartitionedBloom(cfg.seenBuckets, cfg.bloomExpectedItems, cfg.bloomFpp)
    val startWave = runLog.lastCompleteWave match {
      case None =>
        initRun(); 0
      case Some(k) =>
        // resume: rebuild the bloom from the COMPLETE waves only (a torn
        // wave k+1 snapshot must not leak into wave k's re-run). Skip
        // entirely when the frontier is empty - a finished crawl's
        // re-run must be a no-op, not a full-seen-table aggregation
        val seenRows =
          if (frontierT.snapshot(k).get.totalRows == 0) 0L
          else seenT.rowCountThrough(k)
        if (cfg.bloom && seenRows > 0) {
          if (bloomState.wouldSaturate(seenRows)) bloomState.growTo(seenRows)
          val s = seenT.readThrough(k)
          bloomState.add(s, bloomState.bucketCol($"kind", $"url", $"depth"), $"url_hash", seenRows)
        }
        k
    }
    var wave = startWave
    var frontierSize = frontierT.snapshot(wave).get.totalRows
    while (frontierSize > 0 && wave < cfg.maxWaves) {
      frontierSize = runWave(wave, bloomState)
      wave += 1
    }
    awaitQuiesce()
    CrawlSummary(wave, seenT.rowCountThrough(wave), imagesT.rowCountThrough(wave))
  }
}

final case class CrawlSummary(waves: Int, seenRows: Long, imageRows: Long)

/** The skew-safe admission pre-limit, separated for direct testing:
  * AdmissionSpec proves (a) the bound — at most saltSlots * remaining
  * rows per host survive into the global window — and (b) exactness —
  * the admitted set is bit-identical with and without it. */
object Admission {
  import org.apache.spark.sql.functions._

  /** `base` must carry (kind, url, depth, host, visits). Keeps each
    * host's `visitLimit + 1 - visits` smallest rows per salt slot in
    * canonical (kind, url, depth) order. */
  def preLimit(base: DataFrame, visitLimit: Int, saltSlots: Int): DataFrame = {
    val pw = Window.partitionBy(col("host"), col("psalt"))
      .orderBy(col("kind"), col("url"), col("depth"))
    base
      .withColumn("psalt", pmod(xxhash64(col("url")), lit(math.max(1, saltSlots))))
      .withColumn("prn", row_number().over(pw))
      .filter(col("prn") <= lit(visitLimit + 1).cast("long") - col("visits"))
      .drop("psalt", "prn")
  }
}
