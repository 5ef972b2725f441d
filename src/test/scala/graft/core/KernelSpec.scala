package graft.core

import org.scalatest.funsuite.AnyFunSuite

class XxHash64Spec extends AnyFunSuite {
  // Known-answer vectors for xxh64 (public test vectors, seed 0)
  test("xxh64 known answers") {
    assert(XxHash64.hash(Array.emptyByteArray, 0L) == 0xEF46DB3751D8E999L)
    assert(XxHash64.hash("a".getBytes("UTF-8"), 0L) == 0xD24EC4F1A98C6E5BL)
    assert(XxHash64.hash("abc".getBytes("UTF-8"), 0L) == 0x44BC2CF5AD770999L)
    // 32+ byte input exercises the lane loop
    val s = "abcdefghijklmnopqrstuvwxyz0123456789abcdefghijklmnop"
    assert(XxHash64.hash(s.getBytes("UTF-8"), 0L) != 0L)
  }
  test("deterministic + seed-sensitive") {
    assert(XxHash64.hash("http://h0.test/p0") == XxHash64.hash("http://h0.test/p0"))
    assert(XxHash64.hash("x", 1L) != XxHash64.hash("x", 2L))
  }
}

class CanonSpec extends AnyFunSuite {
  import Canon._

  private def abs(s: String): Uri = parseAbsolute(s) match {
    case Absolute(u) => u
    case other       => fail(s"expected Absolute for $s, got $other")
  }

  test("lowercases scheme and host, keeps path case") {
    assert(abs("HTTP://H3.TEST/PaGe").render == "http://h3.test/PaGe")
  }
  test("drops default port, keeps non-default") {
    assert(abs("http://h1.test:80/p1").render == "http://h1.test/p1")
    assert(abs("https://h1.test:443/p1").render == "https://h1.test/p1")
    assert(abs("http://h1.test:8080/p1").render == "http://h1.test:8080/p1")
  }
  test("empty path becomes /") {
    assert(abs("http://h1.test").render == "http://h1.test/")
  }
  test("fragment KEPT (url identity includes it, main.rs:58-62)") {
    assert(abs("http://h1.test/p1#s2").render == "http://h1.test/p1#s2")
    assert(abs("http://h1.test/p1#s2") != abs("http://h1.test/p1"))
  }
  test("dot segments resolved, excess .. clamped") {
    assert(abs("http://h.test/a/./b/../c").render == "http://h.test/a/c")
    assert(abs("http://h.test/../../x").render == "http://h.test/x")
    assert(abs("http://h.test/a/b/").render == "http://h.test/a/b/")
  }
  test("malformed host rejected like url crate InvalidDomainCharacter") {
    assert(parseAbsolute("http://bad host.test/x") == Malformed)
    assert(parseAbsolute("http://") == Malformed)
  }
  test("relative detection") {
    assert(parseAbsolute("p5") == RelativeWithoutBase)
    assert(parseAbsolute("./p5") == RelativeWithoutBase)
    assert(parseAbsolute("/p5") == RelativeWithoutBase)
    assert(parseAbsolute("#frag") == RelativeWithoutBase)
  }
  test("origin rewrite: path cleared to /, query dropped (main.rs:163-164)") {
    val u = abs("http://h.test/a/b?q=1#f")
    assert(u.origin.render == "http://h.test/")
  }
  test("join against origin") {
    val o = abs("http://h.test/deep/dir/page?x=1").origin
    assert(join(o, "p7").get.render == "http://h.test/p7")
    assert(join(o, "./p7").get.render == "http://h.test/p7")
    assert(join(o, "../p7").get.render == "http://h.test/p7")
    assert(join(o, "/p7").get.render == "http://h.test/p7")
    assert(join(o, "//other.test/p1").get.render == "http://other.test/p1")
    assert(join(o, "#s1").get.render == "http://h.test/#s1")
    assert(join(o, "?a=b").get.render == "http://h.test/?a=b")
    assert(join(o, "").get.render == "http://h.test/")
  }
  test("resolveLink applies scheme-substring + host predicates (main.rs:218-219)") {
    val o = abs("http://h.test/p0").origin
    assert(resolveLink("ftp://h.test/x", o).isEmpty)          // no 'http' in scheme
    assert(resolveLink("xhttpx://h.test/x", o).isDefined)     // substring admits it!
    assert(resolveLink("mailto:a@b.c", o).isEmpty)            // no host
    assert(resolveLink("http://bad host.test/x", o).isEmpty)  // malformed -> drop
    assert(resolveLink("p3", o).map(_.render).contains("http://h.test/p3"))
  }
  test("canonicalization is idempotent") {
    val samples = Seq("HTTP://H1.TEST:80/a/../b?q=2#f", "http://h.test", "https://x.test:444/p")
    samples.foreach { s =>
      val once = abs(s).render
      assert(abs(once).render == once)
    }
  }
}

class HtmlTokSpec extends AnyFunSuite {
  test("extracts href from a and src from img, in order, dups kept") {
    val html =
      """<html><body>
        |<a href="/x">one</a>
        |<A HREF='/y'>upper</A>
        |<a href=/unquoted>u</a>
        |<a href="/x">dup</a>
        |<img src="/i1.png" alt="cap">
        |<img   src = "/i2.jpg"/>
        |</body></html>""".stripMargin
    val l = HtmlTok.extract(html)
    assert(l.pageLinks == Vector("/x", "/y", "/unquoted", "/x"))
    assert(l.imageLinks == Vector("/i1.png", "/i2.jpg"))
  }
  test("ignores end tags, comments, non-a/img tags; script CONTENT is tokenized") {
    // html5ever's raw-text states are only entered when the sink
    // requests RawData; the reference's sink always Continues
    // (main.rs:260), so tags inside <script> strings ARE extracted.
    val html =
      """<!-- <a href="/no1">c</a> -->
        |<script>var s = "<a href='/yes-script'>x</a>";</script>
        |<div href="/no3"><a name="n" href="/yes">y</a></div>
        |</a href="/no4">""".stripMargin
    val l = HtmlTok.extract(html)
    assert(l.pageLinks == Vector("/yes-script", "/yes"))
  }
  test("duplicate attr name on one tag: first wins (html5ever finish_attribute)") {
    val l = HtmlTok.extract("""<a href="/a" href="/b">x</a>""")
    assert(l.pageLinks == Vector("/a"))
    // distinct names unaffected
    val l2 = HtmlTok.extract("""<a name="n" href="/c">x</a>""")
    assert(l2.pageLinks == Vector("/c"))
  }
  test("entity decoding in attribute values") {
    val l = HtmlTok.extract("""<a href="/p?a=1&amp;b=2">x</a>""")
    assert(l.pageLinks == Vector("/p?a=1&b=2"))
  }

  test("&amp; decodes LAST: &amp;lt; stays the literal &lt; like html5ever") {
    // the charref consumed the ampersand, so the following "lt;" is
    // plain text — a first-pass &amp; replace would double-decode to <
    val l = HtmlTok.extract("""<a href="/p?a=1&amp;lt;2">x</a>""")
    assert(l.pageLinks == Vector("/p?a=1&lt;2"))
    val l2 = HtmlTok.extract("""<a href="/p?a=&amp;amp;">x</a>""")
    assert(l2.pageLinks == Vector("/p?a=&amp;"))
  }

  test("tag names follow html5ever: <a.b> is a tag NAMED a.b, not <a> with attrs") {
    val l = HtmlTok.extract("""<a.b href="/x">y</a.b><a href="/ok">z</a>""")
    assert(l.pageLinks == Vector("/ok"), l.pageLinks.toString)
    // only ASCII alpha opens a tag: '<' + unicode letter is text
    val l2 = HtmlTok.extract("""<ä href="/no"><a href="/yes">""")
    assert(l2.pageLinks == Vector("/yes"), l2.pageLinks.toString)
  }

  test("abruptly-closed comments <!--> and <!---> do not swallow the document") {
    val l = HtmlTok.extract("""<!--><a href="/a"><!---><a href="/b"><!-- x --><a href="/c">""")
    assert(l.pageLinks == Vector("/a", "/b", "/c"), l.pageLinks.toString)
  }
}

class ImagingSpec extends AnyFunSuite {
  test("png roundtrip is pixel-exact") {
    val img = Imaging.synthPixels("http://h0.test/img/a1.png", 33, 47)
    val back = Imaging.decode(Imaging.encodePng(img))
    assert(Imaging.exactPixels(img, back))
  }
  test("jpeg roundtrip clears PSNR >= 40 dB") {
    val img = Imaging.synthPixels("http://h0.test/img/a2.jpg", 48, 32)
    val back = Imaging.decode(Imaging.encodeJpeg(img))
    assert(Imaging.psnr(img, back) >= 40.0, s"psnr=${Imaging.psnr(img, back)}")
  }
  test("aHash deterministic and robust to jpeg") {
    val id = "http://h0.test/img/a3.jpg"
    val img = Imaging.synthPixels(id, 40, 40)
    val h1 = Imaging.aHash(img)
    assert(h1 == Imaging.aHash(Imaging.synthPixels(id, 40, 40)))
    val back = Imaging.decode(Imaging.encodeJpeg(img))
    assert(Imaging.hamming(h1, Imaging.aHash(back)) <= 4)
  }
}

class SynthWebSpec extends AnyFunSuite {
  val cfg = SynthWeb.WebConfig(nHosts = 4, pagesPerHost = 10, imagesPerHost = 6)

  test("fetch is deterministic and classifies the URL space") {
    val u = SynthWeb.pageUrl(1, 3)
    (SynthWeb.fetch(u, cfg), SynthWeb.fetch(u, cfg)) match {
      case (SynthWeb.PageBody(a), SynthWeb.PageBody(b)) => assert(a == b)
      case other => fail(s"$other")
    }
    assert(SynthWeb.fetch("http://h9.test/p0", cfg) == SynthWeb.NotFound)
    assert(SynthWeb.fetch("http://h0.test/p99", cfg) == SynthWeb.NotFound)
    assert(SynthWeb.fetch("http://elsewhere.com/x", cfg) == SynthWeb.NotFound)
  }
  test("fragment ignored for fetching") {
    val a = SynthWeb.fetch("http://h0.test/p1", cfg)
    val b = SynthWeb.fetch("http://h0.test/p1#s2", cfg)
    (a, b) match {
      case (SynthWeb.PageBody(x), SynthWeb.PageBody(y)) => assert(x == y)
      case other => fail(s"$other")
    }
  }
  test("image fetch returns decodable bytes with declared dims") {
    SynthWeb.fetch("http://h0.test/img/a1.png", cfg) match {
      case SynthWeb.ImageBody(bytes, w, h, fmt) =>
        val img = Imaging.decode(bytes)
        assert(img.getWidth == w && img.getHeight == h && fmt == "png")
      case other => fail(s"$other")
    }
  }
  test("charset: ISO-8859-1 pages decode via the declared charset like response.text()") {
    val cfg = SynthWeb.WebConfig(nHosts = 2, pagesPerHost = 10, imagesPerHost = 2)
    val (bytesIso, csIso) = SynthWeb.pageWire(0, 4, cfg)   // page 4 -> ISO-8859-1
    val (bytesUtf, csUtf) = SynthWeb.pageWire(0, 3, cfg)   // page 3 -> UTF-8
    assert(csIso == "ISO-8859-1" && csUtf == "UTF-8")
    val decoded = SynthWeb.decodeBody(bytesIso, csIso)
    assert(decoded.contains("à la café"))
    // the accented bytes genuinely differ between the two encodings:
    // decoding ISO bytes as UTF-8 would mangle them
    assert(!new String(bytesIso, "UTF-8").contains("à la café"))
    // fetch() returns the correctly decoded body either way
    (SynthWeb.fetch(SynthWeb.pageUrl(0, 4), cfg), SynthWeb.fetch(SynthWeb.pageUrl(0, 3), cfg)) match {
      case (SynthWeb.PageBody(a), SynthWeb.PageBody(b)) =>
        assert(a.contains("à la café") && b.contains("à la café"))
      case other => fail(s"$other")
    }
  }

  test("redirects: chains resolve to final bodies, loops drop after 10 hops") {
    val rcfg = SynthWeb.WebConfig(nHosts = 6, pagesPerHost = 30, imagesPerHost = 5,
      redirectFrac = 0.5)
    var pages, chains, loops = 0
    for (h <- 0 until rcfg.nHosts; s <- 0 until rcfg.pagesPerHost) {
      val u = SynthWeb.redirectUrl(h, s)
      (SynthWeb.fetch(u, rcfg), SynthWeb.fetchFollowing(u, rcfg)) match {
        case (SynthWeb.RedirectTo(loc), fin) =>
          fin match {
            case SynthWeb.PageBody(_) =>
              if (loc.contains("/r")) chains += 1 else pages += 1
            case SynthWeb.NotFound => loops += 1 // >10 hops -> error -> drop
            case other => fail(s"unexpected final for $u: $other")
          }
        case other => fail(s"/r must 3xx: $other")
      }
    }
    assert(pages > 0 && chains > 0 && loops > 0, s"$pages/$chains/$loops")
    // determinism
    assert(SynthWeb.fetchFollowing(SynthWeb.redirectUrl(0, 0), rcfg) ==
      SynthWeb.fetchFollowing(SynthWeb.redirectUrl(0, 0), rcfg))
  }

  test("page links resolve within the configured universe") {
    val html = SynthWeb.pageHtml(2, 5, cfg)
    val origin = Canon.canonicalize(SynthWeb.pageUrl(2, 5)).get.origin
    val links = HtmlTok.extract(html)
    assert(links.pageLinks.nonEmpty && links.imageLinks.nonEmpty)
    val resolved = links.pageLinks.flatMap(Canon.resolveLink(_, origin))
    resolved.foreach { u =>
      assert(u.host.matches("""h\d+\.test"""), u.render)
    }
  }
}

class RefSimSpec extends AnyFunSuite {
  test("seeds-only crawl at depth limit 0 archives children but crawls none") {
    val cfg = SynthWeb.WebConfig(nHosts = 3, pagesPerHost = 5, imagesPerHost = 4)
    val r = RefSim.run(SynthWeb.seeds(2), cfg, depthLimit = 0)
    assert(r.frontiers.length == 1) // only wave 0
    assert(r.seen.nonEmpty)         // children archived (main.rs:130)
    assert(r.hostVisits.values.sum == 2)
  }
  test("terminates and respects 257-cap") {
    val cfg = SynthWeb.WebConfig(nHosts = 3, pagesPerHost = 400, imagesPerHost = 10,
      linksPerPage = 12, malformedFrac = 0.0)
    val r = RefSim.run(SynthWeb.seeds(3), cfg, depthLimit = 4)
    assert(r.hostVisits.values.forall(_ <= 257))
    assert(r.hostVisits.values.exists(_ == 257), r.hostVisits.toString) // cap binds somewhere
  }
  test("seed re-enqueue quirk: seeds are not pre-archived") {
    // A web small enough that some page links back to the seed
    val cfg = SynthWeb.WebConfig(nHosts = 1, pagesPerHost = 3, imagesPerHost = 2,
      linksPerPage = 10, malformedFrac = 0.0, hotFrac = 0.0)
    val r = RefSim.run(Seq(SynthWeb.pageUrl(0, 0)), cfg)
    val seedFinding = Finding(Finding.Page, "http://h0.test/p0", 0)
    // the seed shows up as a finding of some crawled page -> re-enqueued once
    assert(r.seen.contains(seedFinding))
    val seedAdmissions = r.admissions.count(_._2 == seedFinding)
    assert(seedAdmissions == 2, s"seed admitted $seedAdmissions times")
  }
  test("depth never increments: all page findings have depth 0") {
    val cfg = SynthWeb.WebConfig(nHosts = 2, pagesPerHost = 6, imagesPerHost = 4)
    val r = RefSim.run(SynthWeb.seeds(1), cfg, depthLimit = 4)
    assert(r.seen.filter(_.kind == Finding.Page).forall(_.depth == 0))
  }
}
