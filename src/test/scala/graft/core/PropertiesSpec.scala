package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests (SURVEY.md §5.3): canonicalizer idempotence and
  * origin-join laws over the synthetic URL space, budget monotonicity
  * and dedup soundness of the reference simulator for arbitrary small
  * web configs. */
class PropertiesSpec extends AnyFunSuite {
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  private val genHost = Gen.chooseNum(0, 30).map(i => s"h$i.test")
  private val genPath = for {
    n <- Gen.chooseNum(0, 4)
    segs <- Gen.listOfN(n, Gen.oneOf(Gen.alphaNumStr.map(_.take(5)), Gen.const("."), Gen.const("..")))
  } yield "/" + segs.mkString("/")
  private val genUrl = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "HtTpS")
    host <- genHost
    hostCased <- Gen.oneOf(host, host.toUpperCase)
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- genPath
    frag <- Gen.oneOf("", "#a", "#s2")
    q <- Gen.oneOf("", "?x=1")
  } yield s"$scheme://$hostCased$port$path$q$frag"

  test("canonicalization is idempotent over the URL space") {
    check(Prop.forAll(genUrl) { raw =>
      Canon.canonicalize(raw).forall { u =>
        val once = u.render
        Canon.canonicalize(once).map(_.render).contains(once)
      }
    })
  }

  test("origin of any canonical URL is scheme://host[:port]/ and is a fixpoint") {
    check(Prop.forAll(genUrl) { raw =>
      Canon.canonicalize(raw).forall { u =>
        val o = u.origin
        o.path == "/" && o.query.isEmpty && o.fragment.isEmpty && o.origin == o
      }
    })
  }

  test("join of a relative path against an origin stays on the origin host") {
    val genRel = Gen.oneOf(
      Gen.alphaNumStr.map(s => "p" + s.take(4)),
      Gen.alphaNumStr.map(s => "./p" + s.take(4)),
      Gen.alphaNumStr.map(s => "../p" + s.take(4)),
      Gen.alphaNumStr.map(s => "/p" + s.take(4)))
    check(Prop.forAll(genUrl, genRel) { (raw, rel) =>
      Canon.canonicalize(raw).forall { base =>
        Canon.join(base.origin, rel).forall { joined =>
          joined.host == base.host && joined.scheme == base.scheme &&
            joined.path.startsWith("/")
        }
      }
    })
  }

  test("normalizePath: no '.'/'..' survive, always absolute") {
    check(Prop.forAll(genPath) { p =>
      val n = Canon.normalizePath(p)
      val segs = n.split("/").drop(1)
      n.startsWith("/") && !segs.contains(".") && !segs.contains("..")
    })
  }

  private val genCfg = for {
    hosts <- Gen.chooseNum(1, 4)
    pages <- Gen.chooseNum(2, 30)
    links <- Gen.chooseNum(1, 10)
    hot <- Gen.oneOf(0.0, 0.5)
  } yield SynthWeb.WebConfig(nHosts = hosts, pagesPerHost = pages,
    imagesPerHost = 5, linksPerPage = links, hotFrac = hot)

  test("RefSim invariants: budget cap, dedup soundness, archive superset of non-seed frontier") {
    check(Prop.forAll(genCfg) { cfg =>
      val r = RefSim.run(SynthWeb.seeds(math.min(2, cfg.nHosts)), cfg, maxWaves = 20)
      val capOk = r.hostVisits.values.forall(_ <= 257)
      // no finding admitted twice EXCEPT seeds (never pre-archived)
      val seeds = SynthWeb.seeds(math.min(2, cfg.nHosts))
        .map(s => Finding(Finding.Page, Canon.canonicalize(s).get.render, 0)).toSet
      val counts = r.admissions.groupBy(_._2).view.mapValues(_.size)
      val admitOk = counts.forall { case (f, c) => c <= (if (seeds.contains(f)) 2 else 1) }
      // every non-seed frontier row was archived
      val archOk = r.frontiers.drop(1).flatten.forall(r.seen.contains)
      capOk && admitOk && archOk
    })
  }

  test("simhash: identical text -> identical signature; small edit -> small hamming") {
    check(Prop.forAll(Gen.listOfN(30, Gen.oneOf("spark", "scan", "merge", "join", "row", "key", "sort"))) { ws =>
      val t = ws.mkString(" ")
      val a = graft.ops.Dedup.simhash64(t)
      val edited = (ws :+ "extra").mkString(" ")
      val d = java.lang.Long.bitCount(a ^ graft.ops.Dedup.simhash64(edited))
      a == graft.ops.Dedup.simhash64(t) && d <= 40
    })
  }
}
