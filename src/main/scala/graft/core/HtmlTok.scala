package graft.core

/** Tag-level HTML tokenizer mirroring what the reference extracts with
  * html5ever 0.26's BARE tokenizer (no DOM, no tree builder —
  * /root/reference/src/main.rs:166-171,227-262): every StartTag `a`
  * contributes its `href` attribute, every StartTag `img` its `src`,
  * in document order; duplicate TAGS are kept, but a duplicate
  * ATTRIBUTE NAME within one tag is discarded (html5ever's
  * finish_attribute keeps only the first occurrence).
  *
  * Crucially, html5ever's raw-text states (script/style/title/
  * textarea) are only entered when the TokenSink requests them via
  * TokenSinkResult::RawData — and the reference's sink always returns
  * TokenSinkResult::Continue (src/main.rs:260). So the reference
  * tokenizes `<script>` CONTENT as ordinary markup and extracts tags
  * embedded in script strings; we reproduce that. Comments and
  * doctypes are consumed by the tokenizer itself and skipped.
  */
object HtmlTok {

  final case class Links(pageLinks: Vector[String], imageLinks: Vector[String])

  def extract(html: String): Links = {
    val page = Vector.newBuilder[String]
    val img = Vector.newBuilder[String]
    val n = html.length
    var i = 0

    def skipTo(s: String, from: Int): Int = {
      val idx = html.indexOf(s, from)
      if (idx < 0) n else idx + s.length
    }

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0 || lt >= n - 1) { i = n }
      else {
        val c = html.charAt(lt + 1)
        if (c == '!') {
          // comment or doctype. html5ever's abrupt-closing states:
          // "<!-->" and "<!--->" are COMPLETE comments — a plain
          // skipTo("-->") would swallow the rest of the document
          if (html.startsWith("<!--", lt)) {
            val p = lt + 4
            if (p < n && html.charAt(p) == '>') i = p + 1
            else if (p + 1 < n && html.charAt(p) == '-' && html.charAt(p + 1) == '>') i = p + 2
            else i = skipTo("-->", p)
          } else i = skipTo(">", lt + 2)
        } else if (c == '/') {
          i = skipTo(">", lt + 2)
        } else if (c == '?') {
          i = skipTo(">", lt + 2)
        } else if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) {
          // start tag. html5ever: only ASCII alpha OPENS a tag ('<' +
          // anything else is text), and the NAME then consumes every
          // char up to whitespace / '/' / '>' — so "<a.b" is a tag
          // named "a.b" (not "a" with attributes), matching the
          // reference's extraction exactly
          var j = lt + 1
          while (j < n && !html.charAt(j).isWhitespace &&
                 html.charAt(j) != '/' && html.charAt(j) != '>') j += 1
          val name = html.substring(lt + 1, j).toLowerCase
          // attributes; html5ever's finish_attribute drops an attribute
          // whose name was already seen on this tag (first wins)
          var seenAttrs = Set.empty[String]
          var done = false
          while (!done && j < n) {
            // skip whitespace and '/'
            while (j < n && (html.charAt(j).isWhitespace || html.charAt(j) == '/')) j += 1
            if (j >= n) { done = true }
            else if (html.charAt(j) == '>') { j += 1; done = true }
            else {
              // attr name
              val an0 = j
              while (j < n && !html.charAt(j).isWhitespace &&
                     html.charAt(j) != '=' && html.charAt(j) != '>' && html.charAt(j) != '/') j += 1
              val aname = html.substring(an0, j).toLowerCase
              while (j < n && html.charAt(j).isWhitespace) j += 1
              var avalue = ""
              if (j < n && html.charAt(j) == '=') {
                j += 1
                while (j < n && html.charAt(j).isWhitespace) j += 1
                if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                  val quote = html.charAt(j)
                  val v0 = j + 1
                  val vEnd = html.indexOf(quote, v0)
                  if (vEnd < 0) { avalue = html.substring(v0); j = n }
                  else { avalue = html.substring(v0, vEnd); j = vEnd + 1 }
                } else {
                  val v0 = j
                  while (j < n && !html.charAt(j).isWhitespace && html.charAt(j) != '>') j += 1
                  avalue = html.substring(v0, j)
                }
              }
              if (!seenAttrs.contains(aname)) {
                seenAttrs += aname
                if (aname == "href" && name == "a") page += decodeEntities(avalue)
                if (aname == "src" && name == "img") img += decodeEntities(avalue)
              }
            }
          }
          i = j
        } else {
          i = lt + 1
        }
      }
    }
    Links(page.result(), img.result())
  }

  /** html5ever decodes character references in attribute values; our
    * synthetic space only ever emits &amp; — decode the common ones.
    * &amp; LAST: decoding it first would let "&amp;lt;" double-decode
    * to "<" where html5ever emits the literal "&lt;" (the charref
    * consumed the ampersand, so the following "lt;" is plain text). */
  private def decodeEntities(s: String): String =
    if (s.indexOf('&') < 0) s
    else s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"").replace("&amp;", "&")
}
