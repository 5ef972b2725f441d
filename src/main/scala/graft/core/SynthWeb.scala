package graft.core

/** Deterministic synthetic web: a pure function `canonical URL → page
  * HTML | image bytes | 404`. The fetch source for the Spark engine,
  * the RefSim conformance oracle, and the benchmarks alike (FIXTURES.md
  * §1) — same URL in, same bytes out, on any JVM, no I/O, no clock.
  *
  * URL space:
  *   pages  http://h<i>.test/p<j>        i<nHosts, j<pagesPerHost
  *   images http://h<i>.test/img/a<k>.(png|jpg)   k<imagesPerHost
  *
  * Pages link to pages/images with targets derived from
  * xxhash64(url, slot); rendering exercises the canonicalizer (relative
  * links vs the origin-base rule, uppercase scheme/host, explicit
  * default ports, fragments, malformed hosts) per
  * /root/reference/src/main.rs:161-164,207-221.
  */
object SynthWeb {

  final case class WebConfig(
      nHosts: Int = 8,
      pagesPerHost: Int = 40,
      imagesPerHost: Int = 20,
      linksPerPage: Int = 8,
      imagesPerPage: Int = 2,
      relFrac: Double = 0.35,      // same-host links rendered relative
      hotFrac: Double = 0.0,       // skew: fraction of links aimed at host 0
      malformedFrac: Double = 0.04,
      fancyFrac: Double = 0.20,    // uppercase / :80 / #fragment variants
      redirectFrac: Double = 0.0,  // links aimed at the /r redirect space
      jpegFrac: Double = 0.5,
      imgMinDim: Int = 16,         // synthetic image edge bounds (px)
      imgMaxDim: Int = 64,
      seed: Long = 42L
  )

  sealed trait FetchResult
  final case class PageBody(html: String) extends FetchResult
  final case class ImageBody(bytes: Array[Byte], w: Int, h: Int, fmt: String) extends FetchResult
  /** A 3xx hop with an absolute Location. Surfaced only by [[fetch]];
    * [[fetchFollowing]] resolves chains like reqwest does. */
  final case class RedirectTo(location: String) extends FetchResult
  case object NotFound extends FetchResult

  def hostName(i: Int): String = s"h$i.test"
  def pageUrl(host: Int, page: Int): String = s"http://${hostName(host)}/p$page"
  def redirectUrl(host: Int, slot: Int): String = s"http://${hostName(host)}/r$slot"
  def imageUrl(host: Int, img: Int, jpeg: Boolean): String =
    s"http://${hostName(host)}/img/a$img.${if (jpeg) "jpg" else "png"}"

  private val PagePath = """/p(\d+)""".r
  private val RedirectPath = """/r(\d+)""".r
  private val ImagePath = """/img/a(\d+)\.(png|jpg)""".r
  private val HostName = """h(\d+)\.test""".r

  /** Deterministic unit-interval draw from a hash. */
  @inline private def frac(h: Long): Double = ((h >>> 11).toDouble) / (1L << 53).toDouble

  /** The wire form of a page response: body bytes + the Content-Type
    * charset label. Every 5th page is served ISO-8859-1 (its accented
    * body text encodes differently from UTF-8); the rest are UTF-8.
    * [[fetch]] decodes exactly like reqwest's `response.text()`
    * (charset from the header, /root/reference/src/main.rs:155). */
  def pageWire(host: Int, page: Int, cfg: WebConfig): (Array[Byte], String) = {
    val html = pageHtml(host, page, cfg)
    if (page % 5 == 4) (html.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1), "ISO-8859-1")
    else (html.getBytes(java.nio.charset.StandardCharsets.UTF_8), "UTF-8")
  }

  /** response.text(): decode body bytes per the declared charset.
    * reqwest resolves the label via encoding_rs (WHATWG): the labels
    * "ISO-8859-1" / "latin1" / "ascii" all name windows-1252, which
    * differs from Java's true ISO-8859-1 on bytes 0x80-0x9F — so the
    * label is mapped before Charset lookup. (Java's Cp1252 decodes the
    * five undefined slots 0x81/0x8D/0x8F/0x90/0x9D to the same C1
    * controls encoding_rs emits.) */
  def decodeBody(bytes: Array[Byte], charset: String): String = {
    val resolved = charset.toLowerCase match {
      case "iso-8859-1" | "iso8859-1" | "latin1" | "l1" | "ascii" | "us-ascii" =>
        "windows-1252"
      case other => other
    }
    new String(bytes, java.nio.charset.Charset.forName(resolved))
  }

  /** Overflow-safe parse of a regex-guarded digit run: URLs like
    * /p99999999999 exist in the request space (seeds are arbitrary)
    * and must 404 like any web server — js.toInt would instead throw
    * NumberFormatException out of fetch and kill the whole wave. */
  private def numOr404(ds: String): Int =
    if (ds.length <= 9) ds.toInt else Int.MaxValue

  /** Classify + serve a canonical URL. Fragment is ignored for fetching
    * (a GET of `u#x` retrieves `u`), like any HTTP client. */
  def fetch(url: String, cfg: WebConfig): FetchResult = {
    Canon.parseAbsolute(url) match {
      case Canon.Absolute(u) if u.scheme == "http" && u.port == -1 =>
        u.host match {
          case HostName(is) =>
            val i = numOr404(is)
            if (i >= cfg.nHosts) return NotFound
            u.path match {
              case PagePath(js) if numOr404(js) < cfg.pagesPerHost =>
                val (bytes, charset) = pageWire(i, js.toInt, cfg)
                PageBody(decodeBody(bytes, charset))
              case RedirectPath(js) if numOr404(js) < cfg.pagesPerHost =>
                RedirectTo(redirectTarget(i, js.toInt, cfg))
              case ImagePath(ks, ext) if numOr404(ks) < cfg.imagesPerHost =>
                val id = imageUrl(i, ks.toInt, ext == "jpg")
                val (w, h) = imageDims(id, cfg.imgMinDim, cfg.imgMaxDim)
                val img = Imaging.synthPixels(id, w, h)
                val bytes = if (ext == "jpg") Imaging.encodeJpeg(img) else Imaging.encodePng(img)
                ImageBody(bytes, w, h, if (ext == "jpg") "jpeg" else "png")
              case _ => NotFound
            }
          case _ => NotFound
        }
      case _ => NotFound
    }
  }

  /** Deterministic absolute Location for /r<slot> on host i: mostly a
    * direct page (often cross-host), sometimes another /r (chains), and
    * a small self-loop fraction that exercises the >10-hop error path. */
  private def redirectTarget(host: Int, slot: Int, cfg: WebConfig): String = {
    val r = XxHash64.mix(XxHash64.hash(redirectUrl(host, slot)), cfg.seed + 777L)
    val tgtHost = Math.floorMod(XxHash64.mix(r, 1L), cfg.nHosts.toLong).toInt
    val tgtSlot = Math.floorMod(XxHash64.mix(r, 2L), cfg.pagesPerHost.toLong).toInt
    val draw = frac(XxHash64.mix(r, 3L))
    if (draw < 0.05) redirectUrl(host, slot)          // self-loop -> too many redirects
    else if (draw < 0.30) redirectUrl(tgtHost, tgtSlot) // chain
    else pageUrl(tgtHost, tgtSlot)
  }

  /** reqwest 0.11 default redirect policy (the reference's HTTP client,
    * /root/reference/src/main.rs:71-73,150-155): follow up to 10
    * redirects; an 11th redirect response is an error -> the spider
    * warns and drops the page. The REQUEST url (pre-redirect) — not the
    * final url — is what process_page resolves links against
    * (src/main.rs:157,163-164), so callers keep their own request url. */
  def fetchFollowing(url: String, cfg: WebConfig): FetchResult = {
    var cur = url
    var hops = 0
    while (hops <= 10) {
      fetch(cur, cfg) match {
        case RedirectTo(loc) => cur = loc; hops += 1
        case other           => return other
      }
    }
    NotFound // too many redirects -> reqwest error -> warn + drop
  }

  def imageDims(imageId: String, minDim: Int = 16, maxDim: Int = 64): (Int, Int) = {
    val h = XxHash64.hash(imageId)
    val span = (maxDim - minDim + 1).toLong
    (minDim + Math.floorMod(h, span).toInt, minDim + Math.floorMod(h >>> 17, span).toInt)
  }

  private val captionWords = Vector(
    "amber", "basalt", "cirrus", "delta", "ember", "fjord", "glade", "harbor",
    "isle", "juniper", "karst", "lagoon", "mesa", "nimbus", "onyx", "prairie",
    "quartz", "ridge", "summit", "tundra", "umber", "vale", "willow", "zephyr")

  /** Deterministic caption for an image id — conceptually the alt text
    * the page carries for it; pure fn so engine and oracle agree. */
  def caption(imageId: String): String = {
    val h = XxHash64.hash(imageId)
    val n = 4 + Math.floorMod(h, 5L).toInt
    (0 until n).map { i =>
      captionWords(Math.floorMod(XxHash64.mix(h, i.toLong), captionWords.size.toLong).toInt)
    }.mkString(" ")
  }

  /** Pure page generator. Depends only on (host, page, cfg). */
  def pageHtml(host: Int, page: Int, cfg: WebConfig): String = {
    val self = pageUrl(host, page)
    val base = XxHash64.mix(XxHash64.hash(self), cfg.seed)
    val sb = new StringBuilder(1024)
    // NOTE: the <script> body's embedded <a> IS extracted by the
    // reference (bare html5ever tokenizer, raw-text states never
    // entered — main.rs:260), so every page contributes the extra
    // finding <origin>/not-a-real-link (admitted, then 404s). The
    // commented-out link is NOT (comments are tokenizer-level states).
    sb.append("<!DOCTYPE html>\n<html>\n<head><title>page ").append(page)
      .append(" of host ").append(host).append("</title>\n")
      .append("<script>var x = \"<a href='/not-a-real-link'>\";</script>\n")
      .append("</head>\n<body>\n<!-- <a href=\"/commented-out\">nope</a> -->\n")
      // accented body text: ISO-8859-1 pages (pageWire) encode these
      // bytes differently from UTF-8, exercising the charset decode
      .append("<h1>synthetic page à la café</h1>\n")

    var l = 0
    while (l < cfg.linksPerPage) {
      val r = XxHash64.mix(base, 1000L + l)
      if (frac(r) < cfg.malformedFrac) {
        // invalid domain char => url crate parse error => warn + drop
        sb.append("<a href=\"http://bad host").append(Math.floorMod(r, 97L))
          .append(".test/x\">broken</a>\n")
      } else {
        val r2 = XxHash64.mix(r, 1L)
        val tgtHost =
          if (frac(r2) < cfg.hotFrac) 0
          else Math.floorMod(XxHash64.mix(r, 2L), cfg.nHosts.toLong).toInt
        val tgtPage = Math.floorMod(XxHash64.mix(r, 3L), cfg.pagesPerHost.toLong).toInt
        val style = XxHash64.mix(r, 4L)
        val href =
          if (frac(XxHash64.mix(r, 7L)) < cfg.redirectFrac) {
            // a link into the /r redirect space (cross-host allowed)
            s"http://h$tgtHost.test/r$tgtPage"
          } else if (tgtHost == host && frac(XxHash64.mix(r, 5L)) < cfg.relFrac) {
            // relative forms — resolve against ORIGIN per the reference's
            // set_path("") rewrite, all reaching /p<tgtPage>
            Math.floorMod(style, 4L) match {
              case 0 => s"p$tgtPage"
              case 1 => s"./p$tgtPage"
              case 2 => s"../p$tgtPage"
              case _ => s"/p$tgtPage"
            }
          } else if (frac(XxHash64.mix(r, 6L)) < cfg.fancyFrac) {
            Math.floorMod(style, 3L) match {
              case 0 => s"HTTP://H$tgtHost.TEST/p$tgtPage"      // case-normalized away
              case 1 => s"http://h$tgtHost.test:80/p$tgtPage"   // default port dropped
              case _ => s"http://h$tgtHost.test/p$tgtPage#s${Math.floorMod(style, 3L)}" // fragment KEPT => distinct finding
            }
          } else s"http://h$tgtHost.test/p$tgtPage"
        sb.append("<p>lorem <a href=\"").append(href).append("\">link ").append(l).append("</a></p>\n")
      }
      l += 1
    }

    var m = 0
    while (m < cfg.imagesPerPage) {
      val r = XxHash64.mix(base, 2000L + m)
      val tgtImg = Math.floorMod(XxHash64.mix(r, 1L), cfg.imagesPerHost.toLong).toInt
      val jpeg = frac(XxHash64.mix(r, 2L)) < cfg.jpegFrac
      val ext = if (jpeg) "jpg" else "png"
      val id = imageUrl(host, tgtImg, jpeg)
      val src =
        if (frac(XxHash64.mix(r, 3L)) < cfg.relFrac) s"/img/a$tgtImg.$ext"
        else id
      sb.append("<img src=\"").append(src).append("\" alt=\"")
        .append(caption(id)).append("\">\n")
      m += 1
    }

    sb.append("</body>\n</html>\n")
    sb.toString
  }

  /** Engine-extension robots.txt, deterministic per host: every 3rd host
    * disallows /img/, every 5th disallows /p1. Absent in the reference
    * (SURVEY.md §2.8 D4) — OFF in conformance runs. */
  def robots(host: String): Seq[String] = host match {
    case HostName(is) =>
      val i = numOr404(is)
      if (i == Int.MaxValue) return Seq.empty
      (if (i % 3 == 1) Seq("/img/") else Seq.empty) ++
        (if (i % 5 == 2) Seq("/p1") else Seq.empty)
    case _ => Seq.empty
  }

  /** Default seed list: page 0 of the first n hosts. */
  def seeds(n: Int): Seq[String] = (0 until n).map(pageUrl(_, 0))
}
