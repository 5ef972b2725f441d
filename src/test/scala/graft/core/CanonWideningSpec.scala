package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Round-3 Canon widening (VERDICT r2 next #8): IPv6 literals and IDN
  * hosts, kept OUTSIDE the synthetic space (conformance untouched) and
  * pinned here against the url crate's documented WHATWG behavior.
  * Also pins the percent-escape contract: the url crate does NOT decode
  * existing escapes — `%41` and `A` are distinct URLs — which Canon has
  * always matched; the test makes that load-bearing.
  */
class CanonWideningSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  private def parse(s: String): Option[Canon.Uri] = Canon.canonicalize(s)
  private def render(s: String): String = parse(s).get.render

  // ------------------------------------------------------------- IPv6

  test("IPv6: canonical RFC 5952 compression like the url crate serializer") {
    assert(render("http://[::1]/x") == "http://[::1]/x")
    assert(render("http://[0:0:0:0:0:0:0:1]/x") == "http://[::1]/x")
    assert(render("http://[2001:DB8:0:0:8:800:200C:417A]/") == "http://[2001:db8::8:800:200c:417a]/")
    assert(render("http://[2001:db8::1:0:0:1]/") == "http://[2001:db8::1:0:0:1]/")
    // leftmost of two equal zero runs compresses (RFC 5952 §4.2.3)
    assert(render("http://[1:0:0:2:3:0:0:4]/") == "http://[1::2:3:0:0:4]/")
    // a single zero group is NOT compressed
    assert(render("http://[1:2:3:4:0:6:7:8]/") == "http://[1:2:3:4:0:6:7:8]/")
    assert(render("http://[0:0:0:0:0:0:0:0]/") == "http://[::]/")
  }

  test("IPv6: trailing dotted quad expands to hex groups (WHATWG serializer)") {
    assert(render("http://[::ffff:192.168.0.1]/") == "http://[::ffff:c0a8:1]/")
    assert(render("http://[64:ff9b::255.255.255.255]/") == "http://[64:ff9b::ffff:ffff]/")
  }

  test("IPv6: ports split bracket-aware; default port still dropped") {
    assert(render("http://[::1]:8080/x") == "http://[::1]:8080/x")
    assert(render("http://[::1]:80/x") == "http://[::1]/x")
    assert(render("HTTP://[::1]:80/x") == "http://[::1]/x")
  }

  test("IPv6: invalid literals are Malformed (url crate InvalidIpv6Address)") {
    for (bad <- Seq("http://[:::1]/", "http://[1::2::3]/", "http://[12345::]/",
        "http://[1:2:3]/", "http://[1:2:3:4:5:6:7:8:9]/", "http://[::1/",
        "http://[]/", "http://[::1]x/", "http://[gg::1]/",
        "http://[::ffff:192.168.0.256]/", "http://[::ffff:192.168.0]/"))
      assert(parse(bad).isEmpty, s"expected Malformed: $bad")
  }

  test("IPv6: parse∘render is a fixpoint (property)") {
    val addr = Gen.listOfN(8, Gen.chooseNum(0, 0xffff))
    check(Prop.forAll(addr) { gs =>
      val lit = gs.map(Integer.toHexString).mkString(":")
      val u = parse(s"http://[$lit]:9/p").get
      parse(u.render).contains(u)
    })
  }

  // ------------------------------------------------------------- IPv4

  test("IPv4 hosts normalize to dotted decimal like the url crate") {
    assert(render("http://127.0.0.1/x") == "http://127.0.0.1/x")
    assert(render("http://127.1/x") == "http://127.0.0.1/x")
    assert(render("http://0x7f.0.0.1/x") == "http://127.0.0.1/x")
    assert(render("http://2130706433/x") == "http://127.0.0.1/x")
    assert(render("http://0x7f000001/") == "http://127.0.0.1/")
    assert(render("http://192.168.257/") == "http://192.168.1.1/")
    assert(render("http://017700000001/") == "http://127.0.0.1/") // octal packed
    assert(render("http://127.0.0.1./") == "http://127.0.0.1/")   // trailing dot
    assert(render("http://0x.0x.0/") == "http://0.0.0.0/")        // bare 0x = 0
    assert(render("http://127.0.0.1:8080/") == "http://127.0.0.1:8080/")
  }

  test("hosts ending in a number that aren't valid IPv4 are Malformed") {
    for (bad <- Seq("http://foo.123/", "http://1.2.3.4.5/", "http://256.1.1.1/",
        "http://192.168.65536/", "http://4294967296/", "http://1..2/",
        "http://09.1.1.1/")) // leading-0 decimal with non-octal digit
      assert(parse(bad).isEmpty, s"expected Malformed: $bad")
  }

  test("IPv4 normalization is a fixpoint over the packed forms (property)") {
    check(Prop.forAll(Gen.chooseNum(0L, 0xFFFFFFFFL)) { ip =>
      val u = parse(s"http://$ip/p").get
      val dotted = u.host
      // parse again from the canonical dotted form: unchanged
      parse(u.render).contains(u) &&
        dotted.split("\\.").map(_.toLong).zip(Seq(24, 16, 8, 0))
          .map { case (o, s) => o << s }.sum == ip
    })
  }

  // -------------------------------------------------------------- IDN

  test("IDN hosts map to lowercase punycode") {
    assert(render("http://bücher.example/x") == "http://xn--bcher-kva.example/x")
    assert(render("http://BÜCHER.example/x") == "http://xn--bcher-kva.example/x")
    assert(render("http://例え.テスト/") == "http://xn--r8jz45g.xn--zckzah/")
    // already-punycode stays as-is
    assert(render("http://xn--bcher-kva.example/x") == "http://xn--bcher-kva.example/x")
    // UTS-46 NONTRANSITIONAL deviation semantics (r5): the url crate
    // keeps the sharp s and encodes it -- IDNA2003 (java.net.IDN)
    // folded it to `strasse.de`
    assert(render("http://stra\u00dfe.de/x") == "http://xn--strae-oqa.de/x")
    // final sigma kept; capital sigma maps to plain lowercase sigma
    assert(render("http://\u03c3\u03cc\u03bb\u03bf\u03c2.example/") ==
      "http://xn--wxaijb9b.example/")
    // soft hyphen deleted by the mapping
    assert(render("http://b\u00adu\u0308cher.example/x") == "http://xn--bcher-kva.example/x")
    // ASCII-invalid chars surviving the mapping still reject the host
    assert(parse("http://b\u00fcch er.example/x").isEmpty)
    // NFKC can emit uppercase ASCII from code points WITHOUT a simple
    // lowercase mapping (U+1D400 MATHEMATICAL BOLD CAPITAL A -> 'A');
    // the mapping must re-lowercase AFTER NFKC or two urls differing
    // only in such a char get different seen/dedup keys (r6 advisor)
    assert(render("http://\ud835\udc00bc.example/x") == "http://abc.example/x")
    assert(render("http://\ud835\udc00bc.example/x") == render("http://abc.example/x"))
  }

  test("ASCII reg-name behavior is unchanged by the widening (property)") {
    val label = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.toLowerCase)
    check(Prop.forAll(label, Gen.chooseNum(1, 65535)) { (l, port) =>
      val u = parse(s"http://$l.test:$port/a/b").get
      u.host == s"$l.test" && u.port == (if (port == 80) -1 else port)
    })
  }

  // -------------------------------------- percent-escape contract

  test("percent escapes are NOT decoded: %41 and A are distinct findings") {
    val enc = parse("http://h0.test/p%41").get
    val raw = parse("http://h0.test/pA").get
    assert(enc != raw)
    assert(enc.render == "http://h0.test/p%41")
    assert(raw.render == "http://h0.test/pA")
    // and the escape survives a resolve round-trip
    val origin = parse("http://h0.test/").get.origin
    assert(Canon.resolveLink("p%41", origin).map(_.render).contains("http://h0.test/p%41"))
  }

  test("existing escapes keep their hex CASE: WHATWG does not re-normalize %3a") {
    // the url crate copies percent-encoded bytes verbatim — no
    // uppercasing, no decode/re-encode cycle
    assert(render("http://h0.test/p%3a") == "http://h0.test/p%3a")
    assert(render("http://h0.test/p%3A") == "http://h0.test/p%3A")
    assert(parse("http://h0.test/p%3a") != parse("http://h0.test/p%3A"))
  }

  // ------------------------------- path percent-encoding (r4 widening)

  test("non-ASCII path chars are UTF-8 percent-encoded like the url crate") {
    assert(render("http://h0.test/café") == "http://h0.test/caf%C3%A9")
    assert(render("http://h0.test/例") == "http://h0.test/%E4%BE%8B")
    // astral code point: ONE 4-byte UTF-8 sequence, not two escaped
    // surrogates
    assert(render("http://h0.test/a😀b") == "http://h0.test/a%F0%9F%98%80b")
    // WHATWG path set extras
    assert(render("http://h0.test/a{b}c") == "http://h0.test/a%7Bb%7Dc")
    assert(render("http://h0.test/a\u007fb") == "http://h0.test/a%7Fb")
    // UNPAIRED surrogates substitute U+FFFD (%EF%BF%BD) like the
    // WHATWG/url-crate serializer -- String.getBytes would emit '?'
    // (%3F), silently colliding with a real question mark (advisor r4)
    assert(render("http://h0.test/a" + '\ud800' + "b") == "http://h0.test/a%EF%BF%BDb")
    assert(render("http://h0.test/a" + '\udfff' + "b") == "http://h0.test/a%EF%BF%BDb")
  }

  test("rendered paths are always ASCII and encoding is idempotent (property)") {
    val pathChar = Gen.frequency(
      6 -> Gen.alphaNumChar, 1 -> Gen.oneOf(' ', '"', '<', '>', '`', '{', '}', '/'),
      1 -> Gen.oneOf('é', 'ü', '例', '\u0007', '%'),
      1 -> Gen.chooseNum(0x20, 0x7e).map(_.toChar))
    // '?' / '#' may appear: they split query/fragment, which have
    // their own WHATWG encode sets since the second r4 widening
    val path = Gen.listOf(pathChar).map(_.mkString)
    check(Prop.forAll(path) { p =>
      parse(s"http://h0.test/$p") match {
        case None => true // e.g. a stray '?'-free malformed shape — none here
        case Some(u) =>
          val r = u.render
          r.forall(_ < 0x80) && parse(r).contains(u) && parse(r).get.render == r
      }
    })
  }

  test("query and fragment encode their WHATWG sets (url crate serialization)") {
    assert(render("http://h0.test/p?a b'c<d") == "http://h0.test/p?a%20b%27c%3Cd")
    assert(render("http://h0.test/p?q=é") == "http://h0.test/p?q=%C3%A9")
    assert(render("http://h0.test/p#a b`c") == "http://h0.test/p#a%20b%60c")
    assert(render("http://h0.test/p#例") == "http://h0.test/p#%E4%BE%8B")
    // set differences: ' encodes in query but NOT fragment; ` encodes
    // in fragment but NOT query
    assert(render("http://h0.test/p#a'c") == "http://h0.test/p#a'c")
    assert(render("http://h0.test/p?a`c") == "http://h0.test/p?a`c")
    // existing escapes pass through verbatim, case kept (like paths)
    assert(render("http://h0.test/p?x=%3a#f%3a") == "http://h0.test/p?x=%3a#f%3a")
    // resolve-time links encode too (join constructs the components)
    val origin = parse("http://h0.test/").get.origin
    assert(Canon.resolveLink("?q=a b", origin).map(_.render)
      .contains("http://h0.test/?q=a%20b"))
    assert(Canon.resolveLink("#s é", origin).map(_.render)
      .contains("http://h0.test/#s%20%C3%A9"))
  }
}
