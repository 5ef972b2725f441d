package graft

import org.apache.spark.sql.SparkSession

import graft.core.SynthWeb
import graft.crawl.{CrawlConfig, Crawler}

/** Per-round benchmark (driver contract): ONE JSON line
  * {"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}.
  *
  * Two parts:
  *  1. headline operator queries timed on SPARK_GRAFT_SF_DIR at
  *     local[SPARK_GRAFT_CPUS (default 32)]
  *  2. the BASELINE.json north-rule evidence: the same crawl job on the
  *     same synthetic frontier at two core budgets. Each run is a CHILD
  *     JVM pinned with `taskset -c 0-(n-1)` so the budget binds the
  *     WHOLE process (GC, JIT, parquet writers, Netty) exactly like an
  *     n-core executor would — `local[n]` alone only caps task slots
  *     while GC/JIT threads still use every machine core, silently
  *     inflating the small run and understating scaling.
  *
  *     The headline N->4N pair is (2, 8): a pure-CPU spin probe (also
  *     reported) shows this VM's 32 advertised cores are oversubscribed
  *     — 2->8 pinned cores yields a true ~4.0x capacity while 8->32
  *     yields only ~2.6x, so 8->32 CANNOT evidence 4x on this hardware
  *     no matter the software. Both pairs + the hardware ceiling are
  *     reported; see BASELINE.md for interpretation.
  */
object Bench {

  def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def benchConfig(cpus: Int, hosts: Int, lake: String): CrawlConfig = CrawlConfig(
    web = SynthWeb.WebConfig(
      nHosts = hosts, pagesPerHost = 400, imagesPerHost = 200,
      linksPerPage = 14, imagesPerPage = 2, hotFrac = 0.05,
      imgMinDim = 64, imgMaxDim = 128), // realistic-but-bounded payloads
    seeds = SynthWeb.seeds(hosts),      // seed every host: fewer ramp-up waves
    lakeRoot = lake,
    fetchPartitions = cpus * 4,
    saltSlots = 8)

  final case class CrawlBenchResult(
      admitted: Long, secs: Double,
      steadyAdmitted: Long, steadySecs: Double)

  private val jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Pure-CPU capacity of `cpus` pinned cores (spin probe in a child
    * JVM under taskset), in arbitrary work units/sec. Establishes the
    * hardware ceiling any software scaling number sits under. */
  private def spinCapacity(cpus: Int): Double = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq("taskset", "-c", s"0-${cpus - 1}", javaBin,
      "-cp", System.getProperty("java.class.path"), "graft.SpinProbe")
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toVector
    proc.waitFor()
    out.find(_.startsWith("SPIN ")).map(_.split(" ")(1).toDouble).getOrElse(0.0)
  }

  /** Spawn BenchChild pinned to `cpus` cores. */
  private def crawlBench(cpus: Int, hosts: Int): CrawlBenchResult = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq("taskset", "-c", s"0-${cpus - 1}", javaBin) ++ jdk17AddOpens ++ Seq(
      // fixed pre-touched heap: heap-commit growth under a high
      // allocation rate shows up as kernel time (page zeroing) and was
      // measured at 50%+ system CPU in this VM — see BASELINE.md
      "-Xms12g", "-Xmx12g", "-XX:+AlwaysPreTouch",
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.BenchChild", cpus.toString, hosts.toString)
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toVector
    val code = proc.waitFor()
    val line = out.find(_.startsWith("BENCHRESULT ")).getOrElse(
      throw new IllegalStateException(
        s"BenchChild(cpus=$cpus) exit=$code, no result; tail=${out.takeRight(15).mkString("\n")}"))
    val Array(_, adm, secs, sAdm, sSecs) = line.split("\\s+")
    CrawlBenchResult(adm.toLong, secs.toDouble, sAdm.toLong, sSecs.toDouble)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // 2400 hosts (617k admissions): large enough that per-wave fixed
    // costs (job scheduling, commit planning — ~10s/run at ANY core
    // count) amortize below the noise floor of the 2->8 ratio; at 1200
    // they were ~25% of the c8 run and alone capped raw efficiency
    // near 0.75 (measured; see BASELINE.md)
    val benchHosts = sys.env.getOrElse("SPARK_GRAFT_BENCH_HOSTS", "2400").toInt

    // ---- part 1: operator queries at the SF dir. Each query is timed
    // TWICE and the min reported — the same best-of-two protocol the
    // pinned crawl runs already use: the first pass eats JIT + code-gen
    // + FS-cache warmup and any transient hypervisor steal (this VM's
    // deliverable capacity drifts ±15% minute to minute, and a one-shot
    // cold sweep recorded a 4x-degraded crawl smoke in round 2 that no
    // local re-measurement could reproduce — see BASELINE.md).
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    if (!sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) {
      val spark = session(cpus)
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        // per-query CACHE isolation (r5): queries that persist an
        // intermediate (ngramJaccard's shingle table) leak it into the
        // session, and a LATER query whose plan happens to match gets an
        // InMemoryRelation scan instead of its codegen'd pipeline —
        // measured 1.3s -> 5.3s on q_minhash_neardup once
        // q_dedup_clusters (which runs earlier alphabetically) started
        // caching shingles. Decompressing 3M cached strings twice loses
        // to recomputing the split/explode in one whole-stage-codegen
        // pass. Clearing between queries measures each operator's own
        // plan, not an accident of sweep ordering.
        spark.catalog.clearCache()
        def once(): Double = {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        // a broken query must NOT be reported as a fast success: record
        // -1 so the bench line makes the failure visible
        try results(name) = math.min(once(), once())
        catch {
          case t: Throwable =>
            System.err.println(s"bench query $name FAILED: ${t.getClass.getSimpleName}: ${t.getMessage}")
            results(name) = -1.0
        }
      }
      spark.stop()
    }
    val queriesTotal = results.values.filter(_ >= 0).sum

    // ---- hot-host skew evidence (VERDICT r1 #5): one viral host
    // receives 85% of a dense link graph. The budget-aware pre-limit
    // bounds its admission-window partition to saltSlots*remaining rows
    // (the single-task-straggler killer at the 10^10 design point —
    // bound + exactness proven deterministically in AdmissionSpec); it
    // engages adaptively above admitPreLimitMinRows because at sandbox
    // wave sizes its extra exchange costs more than the small sort it
    // avoids. Both times are reported: shipped adaptive defaults vs the
    // pre-limit FORCED on — the gap is the overhead the adaptive rule
    // avoids, and conformance is bit-identical either way.
    if (!sys.env.contains("SPARK_GRAFT_SKIP_HOT")) {
      val spark = session(cpus)
      def hotRun(minRows: Long): Double = {
        val lake = java.nio.file.Files.createTempDirectory(s"hot_$minRows").toString
        val cfg = CrawlConfig(
          web = SynthWeb.WebConfig(nHosts = 300, pagesPerHost = 400, imagesPerHost = 4,
            linksPerPage = 30, imagesPerPage = 0, hotFrac = 0.85,
            malformedFrac = 0.0, imgMinDim = 16, imgMaxDim = 32),
          seeds = SynthWeb.seeds(300), lakeRoot = lake,
          fetchPartitions = cpus * 4, admitPreLimitMinRows = minRows)
        val t0 = System.nanoTime()
        new Crawler(spark, cfg).run()
        val secs = (System.nanoTime() - t0) / 1e9
        BenchChild.deleteRecursively(java.nio.file.Paths.get(lake))
        secs
      }
      // best-of-two, like the query sweep (first run warms JIT/codegen)
      results("crawl_hot_sec") =
        math.min(hotRun(minRows = 4000000L), hotRun(minRows = 4000000L))
      results("crawl_hot_forced_prelimit_sec") =
        math.min(hotRun(minRows = 0L), hotRun(minRows = 0L))
      spark.stop()
    }

    // iteration escape hatch: print the sweep and stop (the pinned
    // scaling pairs take ~25 min and don't change with query tuning)
    if (sys.env.contains("SPARK_GRAFT_QUERIES_ONLY")) {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
        .mkString("{", ",", "}")
      println(s"""{"metric":"total","value":${f"$queriesTotal%.4f"},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
      return
    }

    // ---- part 2: N vs 4N scaling evidence (see object scaladoc).
    // Each crawl run is BRACKETED by spin probes of its core set: the
    // hypervisor's deliverable capacity drifts minute to minute, so the
    // probe average taken around each run is the fairest same-window
    // hardware reference for normalization.
    // SPARK_GRAFT_PROBE_ONLY skips the ~25-min pinned pairs for
    // iterating on the 10k-host scale probe below.
    if (!sys.env.contains("SPARK_GRAFT_PROBE_ONLY")) {
    def bracketed(cpus: Int): (CrawlBenchResult, Double) = {
      val capBefore = spinCapacity(cpus)
      val r = crawlBench(cpus, benchHosts)
      val capAfter = spinCapacity(cpus)
      (r, (capBefore + capAfter) / 2.0)
    }
    // The 2->8 pair is the north-rule evidence; a pair measured in a
    // window where the hypervisor did NOT deliver ~4x capacity (probe
    // ratio < 0.93) cannot evidence the criterion either way, so such
    // draws are re-taken (up to 3 attempts, keeping the cleanest —
    // i.e. highest-capacity-ratio — pair). The probe ratio is always
    // reported next to the software numbers.
    var pair: (CrawlBenchResult, Double, CrawlBenchResult, Double) = null
    var pairAttempts = 0
    var bestRatio = -1.0
    while (pairAttempts < 3 && bestRatio < 0.93) {
      pairAttempts += 1
      val (a2, c2) = bracketed(2)
      val (a8, c8) = bracketed(8)
      val ratio = c8 / (4.0 * c2)
      if (ratio > bestRatio) { bestRatio = ratio; pair = (a2, c2, a8, c8) }
    }
    val (r2, cap2, r8, cap8) = pair
    results("crawl_pair_attempts") = pairAttempts.toDouble
    val (r32, cap32) = bracketed(32)
    results("hw_capacity_eff_2_8") = cap8 / (4.0 * cap2)
    results("hw_capacity_eff_8_32") = cap32 / (4.0 * cap8)
    require(r2.admitted == r8.admitted && r8.admitted == r32.admitted,
      s"bench nondeterminism: $r2 / $r8 / $r32")
    def thr(r: CrawlBenchResult) = r.admitted / r.secs
    def sthr(r: CrawlBenchResult) = r.steadyAdmitted / r.steadySecs
    results("crawl_admitted_urls") = r8.admitted.toDouble
    results("crawl_sec_c2") = r2.secs
    results("crawl_sec_c8") = r8.secs
    results("crawl_sec_c32") = r32.secs
    results("crawl_urls_per_sec_c2") = thr(r2)
    results("crawl_urls_per_sec_c8") = thr(r8)
    results("crawl_urls_per_sec_c32") = thr(r32)
    results("crawl_scaling_efficiency") = thr(r8) / (4.0 * thr(r2))      // N=2 -> 4N=8
    results("crawl_scaling_efficiency_8_32") = thr(r32) / (4.0 * thr(r8))
    results("crawl_steady_urls_per_sec_c2") = sthr(r2)
    results("crawl_steady_urls_per_sec_c8") = sthr(r8)
    results("crawl_steady_urls_per_sec_c32") = sthr(r32)
    results("crawl_steady_scaling_efficiency") = sthr(r8) / (4.0 * sthr(r2))
    results("crawl_steady_scaling_efficiency_8_32") = sthr(r32) / (4.0 * sthr(r8))
    // hardware-normalized: software scaling relative to what the VM's
    // cores actually delivered in the same windows (1.0 = lossless)
    results("crawl_scaling_eff_hw_normalized") =
      (thr(r8) / (4.0 * thr(r2))) / (cap8 / (4.0 * cap2))
    results("crawl_steady_scaling_eff_hw_normalized") =
      (sthr(r8) / (4.0 * sthr(r2))) / (cap8 / (4.0 * cap2))
    }

    // ---- 10,000-host scale probe (recorded per round since r4; was a
    // one-off in BASELINE.md §r3): 4x the bench corpus at unpinned
    // c32 — ~2.6M budget-capped admissions, ~7.3M seen rows. The run
    // must exercise two design-point mechanisms FOR REAL: the adaptive
    // bloom rebuild (7.3M novel > the 4M initial sizing) and resume as
    // a fast no-op on the finished lake.
    if (!sys.env.contains("SPARK_GRAFT_SKIP_SCALE_PROBE")) {
      val spark = session(cpus)
      try {
      val probeHosts = sys.env.getOrElse("SPARK_GRAFT_PROBE_HOSTS", "10000").toInt
      val lake = java.nio.file.Files.createTempDirectory("scale_probe").toString
      val cfg = benchConfig(cpus, probeHosts, lake)
      val t0 = System.nanoTime()
      new Crawler(spark, cfg).run()
      val probeSecs = (System.nanoTime() - t0) / 1e9
      val log = new graft.lake.RunLog(lake)
      val waves = log.completeWaves
      val admitted = waves.map(w => log.stats(w).getOrElse("admitted", 0L)).sum
      val caps = waves.map(w => log.stats(w).getOrElse("bloom_capacity", 0L)).filter(_ > 0)
      val t1 = System.nanoTime()
      new Crawler(spark, cfg).run()
      val resumeSecs = (System.nanoTime() - t1) / 1e9
      // probe assertions are RECORDED, not thrown: this block runs
      // AFTER the ~25-min pinned pairs, and an exception here would
      // destroy the whole round's already-measured scaling evidence
      // (the query sweep uses the same report-don't-throw convention)
      val rebuildFired = caps.distinct.size > 1
      val resumeNoop = new graft.lake.RunLog(lake).completeWaves == waves
      if (!rebuildFired) System.err.println(
        s"scale probe: adaptive bloom rebuild did NOT fire (capacities=$caps)")
      if (!resumeNoop) System.err.println("scale probe: resume re-ran committed waves")
      results("crawl_scale_probe_admitted") = admitted.toDouble
      results("crawl_scale_probe_sec") = probeSecs
      results("crawl_scale_probe_urls_per_sec") = admitted / probeSecs
      results("crawl_scale_probe_resume_sec") = resumeSecs
      results("crawl_scale_probe_bloom_rebuild_fired") = if (rebuildFired) 1.0 else 0.0
      results("crawl_scale_probe_resume_noop") = if (resumeNoop) 1.0 else 0.0
      BenchChild.deleteRecursively(java.nio.file.Paths.get(lake))
      } catch {
        // the same report-don't-throw convention as the assertions
        // above, extended to the run itself: a heap exhaustion in a
        // degraded window (seen once at the 8g default driver heap,
        // image write of wave 4) must not destroy the round's
        // already-measured ~25 min of pinned scaling evidence
        case e: Throwable =>
          System.err.println(s"scale probe FAILED (recorded, not thrown): $e")
          results("crawl_scale_probe_failed") = 1.0
      } finally spark.stop()
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f"$queriesTotal%.4f"},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
  }
}

/** Pure-CPU spin probe: 32 threads, 2 seconds, prints total work done.
  * Run pinned via taskset to measure the real capacity of a core set. */
object SpinProbe {
  def main(a: Array[String]): Unit = {
    val threads = 32
    val counts = new Array[Long](threads)
    val ts = (0 until threads).map { k =>
      new Thread(() => {
        var c = 0L
        val end = System.nanoTime() + 2000000000L
        while (System.nanoTime() < end) {
          var j = 0
          while (j < 10000) { c += j * 31L; j += 1 }
        }
        counts(k) = c
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    println(s"SPIN ${counts.sum / 2.0e9}")
  }
}

/** Child process entry for one pinned crawl-bench run: JIT-warms on a
  * small corpus, runs the measured corpus, prints ONE machine-readable
  * line. Pinning happens in the parent via taskset. */
object BenchChild {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val hosts = args(1).toInt
    val spark = Bench.session(cpus)
    try {
      def run(h: Int): (Long, Double, Long, Double) = {
        val lake = java.nio.file.Files.createTempDirectory(s"bench_lake_$cpus").toString
        val t0 = System.nanoTime()
        new Crawler(spark, Bench.benchConfig(cpus, h, lake)).run()
        val secs = (System.nanoTime() - t0) / 1e9
        val log = new graft.lake.RunLog(lake)
        val perWave = log.completeWaves.map(w => log.stats(w))
        val admitted = perWave.map(_.getOrElse("admitted", 0L)).sum
        val steady = perWave.maxBy(_.getOrElse("admitted", 0L))
        deleteRecursively(java.nio.file.Paths.get(lake))
        (admitted, secs, steady.getOrElse("admitted", 0L),
          steady.getOrElse("wall_ms", 1L) / 1e3)
      }
      run(math.max(hosts / 8, 50)) // JIT warmup
      // best of two measured runs: hypervisor steal on this VM varies
      // minute to minute, and the best draw is the closest view of the
      // unimpeded hardware at each core budget
      val (adm1, secs1, sAdm1, sSecs1) = run(hosts)
      val (adm2, secs2, sAdm2, sSecs2) = run(hosts)
      require(adm1 == adm2 && sAdm1 == sAdm2, s"nondeterminism: $adm1/$adm2 $sAdm1/$sAdm2")
      println(f"BENCHRESULT $adm1 ${math.min(secs1, secs2)}%.3f " +
        f"$sAdm1 ${math.min(sSecs1, sSecs2)}%.3f")
    } finally spark.stop()
  }

  private[graft] def deleteRecursively(p: java.nio.file.Path): Unit =
    graft.lake.Lake.deleteRecursively(p)
}
