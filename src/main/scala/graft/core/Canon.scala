package graft.core

/** URL parsing / canonicalization mirroring the semantics the reference
  * gets from the `url` crate v2.3.1 (WHATWG URL), scoped to the URL
  * shapes the synthetic web emits and property-tested in CanonSpec.
  *
  * Reference behaviors reproduced (cites into /root/reference):
  *  - lowercase scheme + host, default port dropped (url 2.3.1 norm)
  *  - fragments KEPT — `#x` distinguishes URLs in equality/Hash
  *    (src/main.rs:58-62 hashes the whole Url)
  *  - relative links resolve against the ORIGIN (page URL with
  *    `set_path("")`, `set_query(None)`) — src/main.rs:161-164
  *  - scheme predicate is substring `contains("http")`, host must be
  *    present — src/main.rs:218-219
  *  - dot-segment resolution, excess `..` clamped at root (WHATWG)
  */
object Canon {

  /** Parsed canonical URL. `port == -1` means no explicit port. */
  final case class Uri(
      scheme: String,
      host: String,
      port: Int,
      path: String,
      query: Option[String],
      fragment: Option[String]
  ) {
    def render: String = {
      val sb = new StringBuilder(scheme).append("://").append(host)
      if (port >= 0) sb.append(':').append(port)
      sb.append(path)
      query.foreach(q => sb.append('?').append(q))
      fragment.foreach(f => sb.append('#').append(f))
      sb.toString
    }

    /** The reference's base rewrite: set_path("") + set_query(None);
      * special-scheme path is never empty so it becomes "/". The
      * fragment survives set_path/set_query but never flows into join
      * results (RFC 3986 §5.3), so we drop it here. src/main.rs:161-164 */
    def origin: Uri = copy(path = "/", query = None, fragment = None)
  }

  sealed trait ParseResult
  final case class Absolute(uri: Uri) extends ParseResult
  case object RelativeWithoutBase extends ParseResult
  case object Malformed extends ParseResult

  private val defaultPorts = Map("http" -> 80, "https" -> 443, "ws" -> 80, "wss" -> 443, "ftp" -> 21)

  private def isSchemeStart(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isSchemeChar(c: Char) =
    isSchemeStart(c) || (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'

  /** Chars we accept in a registered-name host (ASCII domains + IPv4). */
  private def isHostChar(c: Char) =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '.' || c == '_'

  /** RFC 5952 / WHATWG canonical form of an IPv6 host (the url crate's
    * serializer): lowercase hex, no leading zeros, the longest run of
    * >= 2 zero groups (leftmost on ties) compressed to `::`, trailing
    * dotted-quad (e.g. `::ffff:192.168.0.1`) expanded to hex groups.
    * None = invalid literal (url crate InvalidIpv6Address). */
  private[core] def normalizeIpv6(lit: String): Option[String] = {
    if (lit.isEmpty) return None
    val dc = lit.indexOf("::")
    if (dc >= 0 && lit.indexOf("::", dc + 1) >= 0) return None // one '::' max
    def parseGroups(part: String, allowV4: Boolean): Option[Vector[Int]] = {
      if (part.isEmpty) return Some(Vector.empty)
      val toks = part.split(":", -1).toVector
      if (toks.exists(_.isEmpty)) return None // stray ':' (only '::' may elide)
      val (hexToks, v4Toks) =
        if (allowV4 && toks.last.contains('.')) (toks.init, Some(toks.last))
        else (toks, None)
      val hex = hexToks.map { t =>
        if (t.length < 1 || t.length > 4 || !t.forall(c => Character.digit(c, 16) >= 0))
          return None
        Integer.parseInt(t, 16)
      }
      val v4 = v4Toks.map { q =>
        val bs = q.split("\\.", -1)
        if (bs.length != 4) return None
        val ints = bs.map { b =>
          if (b.isEmpty || b.length > 3 || !b.forall(_.isDigit)) return None
          val v = b.toInt
          if (v > 255 || (b.length > 1 && b.startsWith("0"))) return None
          v
        }
        Vector(ints(0) * 256 + ints(1), ints(2) * 256 + ints(3))
      }
      Some(hex ++ v4.getOrElse(Vector.empty))
    }
    val groups: Vector[Int] =
      if (dc < 0) parseGroups(lit, allowV4 = true) match {
        case Some(g) if g.length == 8 => g
        case _                        => return None
      }
      else {
        val (left, right) = (lit.substring(0, dc), lit.substring(dc + 2))
        (parseGroups(left, allowV4 = false), parseGroups(right, allowV4 = true)) match {
          case (Some(l), Some(r)) if l.length + r.length <= 7 =>
            l ++ Vector.fill(8 - l.length - r.length)(0) ++ r
          case _ => return None
        }
      }
    // longest zero run (>= 2, leftmost) -> '::'
    var bestStart = -1; var bestLen = 0
    var i = 0
    while (i < 8) {
      if (groups(i) == 0) {
        var j = i
        while (j < 8 && groups(j) == 0) j += 1
        if (j - i > bestLen) { bestStart = i; bestLen = j - i }
        i = j
      } else i += 1
    }
    def hexs(g: Seq[Int]) = g.map(Integer.toHexString).mkString(":")
    Some(
      if (bestLen < 2) hexs(groups)
      else {
        val head = hexs(groups.take(bestStart))
        val tail = hexs(groups.drop(bestStart + bestLen))
        head + "::" + tail
      })
  }

  /** WHATWG "ends in a number" check (host parser step 11): the final
    * dot label (ignoring one trailing dot) is decimal, leading-0
    * octal-ish, or 0x-hex — such a host MUST parse as IPv4. */
  private def endsInNumber(host: String): Boolean = {
    val parts0 = host.split("\\.", -1)
    val parts = if (parts0.nonEmpty && parts0.last.isEmpty) parts0.dropRight(1) else parts0
    if (parts.isEmpty || parts.last.isEmpty) false
    else {
      val last = parts.last
      last.forall(_.isDigit) ||
        (last.startsWith("0x") && last.drop(2).forall(c => Character.digit(c, 16) >= 0))
    }
  }

  /** One IPv4 "number" per the WHATWG IPv4-number parser: 0x-hex
    * (bare "0x" = 0), leading-0 octal, or decimal. */
  private def parseIpv4Number(s: String): Option[Long] = {
    if (s.isEmpty) None
    else if (s.startsWith("0x")) {
      val rest = s.drop(2)
      if (rest.isEmpty) Some(0L)
      else if (rest.length <= 8 && rest.forall(c => Character.digit(c, 16) >= 0))
        Some(java.lang.Long.parseLong(rest, 16))
      else None
    } else if (s.length > 1 && s.startsWith("0")) {
      val rest = s.drop(1)
      if (rest.length <= 11 && rest.forall(c => c >= '0' && c <= '7'))
        Some(java.lang.Long.parseLong(rest, 8))
      else None
    } else if (s.length <= 10 && s.forall(_.isDigit)) Some(s.toLong)
    else None
  }

  /** WHATWG IPv4 parser + serializer: up to 4 dot parts (one trailing
    * dot tolerated), the last part packing the remaining octets;
    * canonical form is plain dotted decimal — `127.1`, `0x7f.0.0.1`
    * and `2130706433` all render `127.0.0.1` like the url crate. */
  private[core] def normalizeIpv4(host: String): Option[String] = {
    val parts0 = host.split("\\.", -1).toVector
    val parts = if (parts0.nonEmpty && parts0.last.isEmpty) parts0.dropRight(1) else parts0
    if (parts.isEmpty || parts.length > 4) return None
    val nums = parts.map(p => parseIpv4Number(p).getOrElse(return None))
    if (nums.init.exists(_ > 255L)) return None
    if (nums.last >= (1L << (8 * (5 - parts.length)))) return None
    val ipv4 = nums.init.zipWithIndex.map { case (n, i) => n << (8 * (3 - i)) }.sum + nums.last
    Some(Seq(24, 16, 8, 0).map(s => (ipv4 >> s) & 0xffL).mkString("."))
  }

  /** Host canonicalization beyond ASCII reg-names (round-3 widening,
    * guarded by CanonWideningSpec; the synthetic space emits only ASCII
    * reg-names, so conformance is untouched): bracketed IPv6 literals
    * get the RFC 5952 canonical form; non-ASCII (IDN) hosts map to
    * punycode per a UTS-46 NONTRANSITIONAL approximation (r5 — was
    * java.net.IDN's IDNA2003): per-label lowercase + NFKC mapping,
    * soft hyphen deleted, DEVIATION characters (ß, ς, ZWJ, ZWNJ) kept
    * rather than IDNA2003-mapped — so `straße.de` renders
    * `xn--strae-oqa.de` like the url crate, not `strasse.de`. The full
    * UTS-46 table (per-code-point disallowed set, CONTEXTJ rules,
    * BiDi) is out of scope and honestly approximated: ASCII validity
    * is still enforced on the final form. */
  private def canonicalizeHost(hostRaw: String): Option[String] = {
    if (hostRaw.startsWith("[") || hostRaw.endsWith("]")) {
      if (!(hostRaw.length >= 3 && hostRaw.startsWith("[") && hostRaw.endsWith("]")))
        return None
      normalizeIpv6(hostRaw.substring(1, hostRaw.length - 1)).map("[" + _ + "]")
    } else if (hostRaw.exists(_ >= 0x80)) {
      val ascii = hostRaw.split("\\.", -1).map(idnLabelToAscii).mkString(".")
      if (ascii.nonEmpty && ascii.forall(isHostChar)) Some(ascii) else None
    } else if (hostRaw.forall(isHostChar)) {
      val lower = hostRaw.toLowerCase
      // a host whose final label is numeric MUST be IPv4 (WHATWG): the
      // url crate normalizes 127.1 / 0x7f.0.0.1 / 2130706433 to
      // 127.0.0.1 and rejects foo.123 outright
      if (endsInNumber(lower)) normalizeIpv4(lower) else Some(lower)
    } else None // InvalidDomainCharacter
  }

  /** One IDN label → ASCII: existing ACE labels pass through; the
    * UTS-46 mapping approximation is per-code-point lowercase then
    * NFKC (UTS-46's map phase ≈ NFKC casefold; lowercase keeps ß and
    * final sigma — the nontransitional deviation semantics — where
    * IDNA2003's nameprep folds ß→ss), soft hyphens deleted; an
    * all-ASCII result stays literal, anything else Punycode-encodes.
    * Invalid ASCII output (spaces, controls…) is caught by the
    * caller's isHostChar pass. */
  private def idnLabelToAscii(label: String): String = {
    if (label.startsWith("xn--")) return label
    val sb = new StringBuilder(label.length)
    var i = 0
    while (i < label.length) {
      val cp = label.codePointAt(i)
      if (cp != 0x00AD) sb.appendAll(Character.toChars(Character.toLowerCase(cp)))
      i += Character.charCount(cp)
    }
    val nfkc = java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFKC)
    // re-lowercase AFTER NFKC (r6, advisor): NFKC can emit uppercase
    // ASCII from code points with no simple lowercase mapping (e.g.
    // U+1D400 MATHEMATICAL BOLD CAPITAL A → 'A'); isHostChar accepts
    // A-Z, so without this pass two urls differing only in such a char
    // canonicalized to different seen/dedup keys, diverging from
    // UTS-46/url-crate (pinned in CanonWideningSpec).
    val mapped = {
      val sb2 = new StringBuilder(nfkc.length)
      var j = 0
      while (j < nfkc.length) {
        val cp = nfkc.codePointAt(j)
        sb2.appendAll(Character.toChars(Character.toLowerCase(cp)))
        j += Character.charCount(cp)
      }
      sb2.toString
    }
    if (mapped.forall(_ < 0x80)) mapped else "xn--" + punycodeEncode(mapped)
  }

  /** RFC 3492 Punycode encoding (the spec's published algorithm;
    * parameters straight from §5). Labels are tiny, so the spec's
    * overflow guards reduce to the int range check below. */
  private def punycodeEncode(input: String): String = {
    val Base = 36; val TMin = 1; val TMax = 26; val Skew = 38; val Damp = 700
    val cps: Array[Int] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < input.length) {
        val cp = input.codePointAt(i); buf += cp; i += Character.charCount(cp)
      }
      buf.toArray
    }
    val out = new StringBuilder
    cps.foreach(c => if (c < 0x80) out.append(c.toChar))
    val b = out.length
    var h = b
    if (b > 0) out.append('-')
    var n = 128; var delta = 0; var bias = 72
    def adapt(d0: Int, numPoints: Int, firstTime: Boolean): Int = {
      var d = if (firstTime) d0 / Damp else d0 / 2
      d += d / numPoints
      var k = 0
      while (d > ((Base - TMin) * TMax) / 2) { d /= Base - TMin; k += Base }
      k + (((Base - TMin + 1) * d) / (d + Skew))
    }
    def digit(d: Int): Char = if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar
    while (h < cps.length) {
      val m = cps.iterator.filter(_ >= n).min
      delta += (m - n) * (h + 1)
      n = m
      cps.foreach { c =>
        if (c < n) delta += 1
        else if (c == n) {
          var q = delta
          var k = Base
          var emitting = true
          while (emitting) {
            val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
            if (q < t) { out.append(digit(q)); emitting = false }
            else {
              out.append(digit(t + ((q - t) % (Base - t))))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          bias = adapt(delta, h + 1, h == b)
          delta = 0
          h += 1
        }
      }
      delta += 1
      n += 1
    }
    out.toString
  }

  /** The WHATWG path percent-encode set (url crate `path()`
    * serialization): C0 controls, space, `"` `<` `>` `` ` `` `{` `}`,
    * DEL — widened in r4 from the minimal synthetic-space subset,
    * behind CanonWideningSpec properties. `?` and `#` never reach the
    * path (parse splits query/fragment first). Existing `%xx` escapes
    * pass through UNTOUCHED, case included: WHATWG does not
    * re-normalize percent-encoding (`%3a` stays `%3a`, `%41` ≠ `A`),
    * and that passthrough is also what makes encoding idempotent. */
  private def encodePathChar(c: Char, sb: StringBuilder): Unit = c match {
    case ' '            => sb.append("%20")
    case '"'            => sb.append("%22")
    case '<'            => sb.append("%3C")
    case '>'            => sb.append("%3E")
    case '`'            => sb.append("%60")
    case '{'            => sb.append("%7B")
    case '}'            => sb.append("%7D")
    case c if c < 0x20 || c == 0x7f => sb.append(f"%%${c.toInt}%02X")
    case c              => sb.append(c)
  }

  /** WHATWG query percent-encode set for special URLs (url crate
    * `query()` serialization): C0 controls, space, `"` `#` `<` `>`
    * `'`, DEL. Existing `%xx` passes through verbatim like the path. */
  private def encodeQueryChar(c: Char, sb: StringBuilder): Unit = c match {
    case ' '            => sb.append("%20")
    case '"'            => sb.append("%22")
    case '#'            => sb.append("%23")
    case '<'            => sb.append("%3C")
    case '>'            => sb.append("%3E")
    case '\''           => sb.append("%27")
    case c if c < 0x20 || c == 0x7f => sb.append(f"%%${c.toInt}%02X")
    case c              => sb.append(c)
  }

  /** WHATWG fragment percent-encode set: C0 controls, space,
    * `"` `<` `>` `` ` ``, DEL. */
  private def encodeFragmentChar(c: Char, sb: StringBuilder): Unit = c match {
    case ' '            => sb.append("%20")
    case '"'            => sb.append("%22")
    case '<'            => sb.append("%3C")
    case '>'            => sb.append("%3E")
    case '`'            => sb.append("%60")
    case c if c < 0x20 || c == 0x7f => sb.append(f"%%${c.toInt}%02X")
    case c              => sb.append(c)
  }

  /** Shared serializer loop: ASCII through the component's encode set,
    * non-ASCII UTF-8 percent-encoded (url crate: `é` → `%C3%A9`), by
    * CODE POINT so astral chars encode as one 4-byte sequence, not two
    * escaped surrogates. Rendered URLs are therefore always ASCII
    * (CanonWideningSpec property). Encoding happens at CONSTRUCTION
    * (parse/join), like the url crate's internal form, so parse∘render
    * is a fixpoint and equality/dedup see the canonical bytes. */
  private def encodeComponent(p: String, enc: (Char, StringBuilder) => Unit): String = {
    val sb = new StringBuilder(p.length)
    var i = 0
    while (i < p.length) {
      val cp = p.codePointAt(i)
      if (cp < 0x80) enc(cp.toChar, sb)
      else if (cp >= 0xD800 && cp <= 0xDFFF)
        // UNPAIRED surrogate (codePointAt returned the raw surrogate):
        // WHATWG/url-crate serialization substitutes U+FFFD and
        // percent-encodes it (%EF%BF%BD); String.getBytes("UTF-8")
        // would silently substitute '?' (%3F) instead — advisor r4
        sb.append("%EF%BF%BD")
      else new String(Character.toChars(cp)).getBytes("UTF-8")
        .foreach(b => sb.append(f"%%${b & 0xff}%02X"))
      i += Character.charCount(cp)
    }
    sb.toString
  }

  private def encodePath(p: String): String = encodeComponent(p, encodePathChar)
  private def encodeQuery(q: String): String = encodeComponent(q, encodeQueryChar)
  private def encodeFragment(f: String): String = encodeComponent(f, encodeFragmentChar)

  /** WHATWG dot-segment resolution; excess ".." at root is discarded. */
  def normalizePath(path: String): String = {
    if (path.isEmpty) return "/"
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val segs = path.split("/", -1)
    // segs(0) is "" for absolute paths
    var i = 1
    val trailingSlash =
      segs.last.isEmpty || segs.last == "." || segs.last == ".."
    while (i < segs.length) {
      segs(i) match {
        case "." | ""        => () // collapse; trailing handled below
        case ".."            => if (out.nonEmpty) out.remove(out.length - 1)
        case s               => out += s
      }
      i += 1
    }
    val base = "/" + out.mkString("/")
    if (trailingSlash && !base.endsWith("/")) base + "/" else base
  }

  /** Parse an absolute URL string. Scheme must be present, else
    * RelativeWithoutBase. Invalid host chars => Malformed (mirrors url
    * crate InvalidDomainCharacter / EmptyHost errors, src/main.rs:212-214). */
  def parseAbsolute(raw: String): ParseResult = {
    val s = raw.trim
    if (s.isEmpty) return RelativeWithoutBase
    // find scheme
    if (!isSchemeStart(s.charAt(0))) return RelativeWithoutBase
    var i = 1
    while (i < s.length && isSchemeChar(s.charAt(i))) i += 1
    if (i >= s.length || s.charAt(i) != ':') return RelativeWithoutBase
    val scheme = s.substring(0, i).toLowerCase
    var rest = s.substring(i + 1)
    // we only model hierarchical (special-ish) URLs: need //authority
    if (!rest.startsWith("//")) {
      // opaque non-special URL like mailto:foo — parses OK in the url
      // crate with no host; the reference drops it at host().is_some()
      // (src/main.rs:219). Model as Absolute with empty host.
      return Absolute(Uri(scheme, "", -1, rest, None, None))
    }
    rest = rest.substring(2)
    // split off fragment, then query, then path
    var fragment: Option[String] = None
    val hashIdx = rest.indexOf('#')
    if (hashIdx >= 0) { fragment = Some(encodeFragment(rest.substring(hashIdx + 1))); rest = rest.substring(0, hashIdx) }
    var query: Option[String] = None
    val qIdx = rest.indexOf('?')
    if (qIdx >= 0) { query = Some(encodeQuery(rest.substring(qIdx + 1))); rest = rest.substring(0, qIdx) }
    val slashIdx = rest.indexOf('/')
    val (authority, path0) =
      if (slashIdx >= 0) (rest.substring(0, slashIdx), rest.substring(slashIdx)) else (rest, "")
    // userinfo (synthetic space never emits it, but strip defensively)
    val auth = authority.substring(authority.indexOf('@') + 1)
    if (auth.isEmpty) return Malformed // EmptyHost
    // bracket-aware split: an IPv6 literal's colons are not the port's
    val (hostRaw, portRaw) =
      if (auth.startsWith("[")) {
        val close = auth.indexOf(']')
        if (close < 0) return Malformed
        val afterHost = auth.substring(close + 1)
        if (afterHost.isEmpty) (auth, "")
        else if (afterHost.startsWith(":")) (auth.substring(0, close + 1), afterHost.substring(1))
        else return Malformed
      } else {
        val colonIdx = auth.lastIndexOf(':')
        if (colonIdx >= 0 && auth.drop(colonIdx + 1).forall(_.isDigit) && colonIdx != auth.length - 1)
          (auth.substring(0, colonIdx), auth.substring(colonIdx + 1))
        else if (colonIdx >= 0 && colonIdx == auth.length - 1) (auth.substring(0, colonIdx), "")
        else if (colonIdx >= 0) return Malformed // non-numeric port
        else (auth, "")
      }
    if (hostRaw.isEmpty) return Malformed
    val host = canonicalizeHost(hostRaw).getOrElse(return Malformed)
    val port =
      if (portRaw.isEmpty) -1
      else {
        val p = try portRaw.toInt catch { case _: NumberFormatException => return Malformed }
        if (p > 65535) return Malformed
        if (defaultPorts.get(scheme).contains(p)) -1 else p
      }
    val path = encodePath(normalizePath(path0))
    Absolute(Uri(scheme, host, port, path, query, fragment))
  }

  /** RFC 3986 §5.2 resolution of `link` against `base` (the reference
    * always joins against the page ORIGIN — src/main.rs:163-164,211).
    * Returns None when the join itself fails; the reference `.unwrap()`s
    * that case (panic), which our synthetic space never triggers. */
  def join(base: Uri, link: String): Option[Uri] = {
    val l = link.trim
    if (l.isEmpty) return Some(base.copy(fragment = None))
    if (l.startsWith("//")) {
      // protocol-relative: re-parse with base scheme
      parseAbsolute(base.scheme + ":" + l) match {
        case Absolute(u) => Some(u)
        case _           => None
      }
    } else if (l.startsWith("#")) {
      Some(base.copy(fragment = Some(encodeFragment(l.substring(1)))))
    } else if (l.startsWith("?")) {
      val hashIdx = l.indexOf('#')
      if (hashIdx >= 0)
        Some(base.copy(query = Some(encodeQuery(l.substring(1, hashIdx))),
          fragment = Some(encodeFragment(l.substring(hashIdx + 1)))))
      else Some(base.copy(query = Some(encodeQuery(l.substring(1))), fragment = None))
    } else {
      // path (absolute or relative) [+ query][+ fragment]
      var rest = l
      var fragment: Option[String] = None
      val hashIdx = rest.indexOf('#')
      if (hashIdx >= 0) { fragment = Some(encodeFragment(rest.substring(hashIdx + 1))); rest = rest.substring(0, hashIdx) }
      var query: Option[String] = None
      val qIdx = rest.indexOf('?')
      if (qIdx >= 0) { query = Some(encodeQuery(rest.substring(qIdx + 1))); rest = rest.substring(0, qIdx) }
      val merged =
        if (rest.startsWith("/")) rest
        else {
          // merge with base path's directory (base path here is "/" from
          // origin rewrite, so this is "/"+rest; keep general anyway)
          val bp = base.path
          bp.substring(0, bp.lastIndexOf('/') + 1) + rest
        }
      Some(base.copy(path = encodePath(normalizePath(merged)), query = query, fragment = fragment))
    }
  }

  /** Full link pipeline of parse_links (src/main.rs:207-221): parse;
    * relative => join with origin base; malformed => None (warn+drop);
    * then scheme-substring + host-present predicates. */
  def resolveLink(link: String, originBase: Uri): Option[Uri] = {
    val parsed = parseAbsolute(link) match {
      case Absolute(u)          => Some(u)
      case RelativeWithoutBase  => join(originBase, link)
      case Malformed            => None
    }
    parsed
      .filter(_.scheme.contains("http")) // substring, NOT equality (src/main.rs:218)
      .filter(_.host.nonEmpty)           // host().is_some() (src/main.rs:219)
  }

  /** Canonical string for a raw absolute URL (e.g. seeds). None if it
    * fails to parse — the reference PANICS on malformed seeds
    * (src/main.rs:301-307), so callers fail the job on None. */
  def canonicalize(raw: String): Option[Uri] = parseAbsolute(raw) match {
    case Absolute(u) => Some(u)
    case _           => None
  }

  def hostOf(canonicalUrl: String): String = parseAbsolute(canonicalUrl) match {
    case Absolute(u) => u.host
    case _           => ""
  }
}
