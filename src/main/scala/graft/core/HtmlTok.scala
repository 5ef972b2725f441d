package graft.core

/** Tag-level HTML tokenizer mirroring what the reference extracts with
  * html5ever's tokenizer (no DOM): every StartTag `a` contributes each
  * `href` attribute value, every StartTag `img` contributes each `src`
  * attribute value, in document order, duplicates kept
  * (/root/reference/src/main.rs:227-262). Comments, end tags, doctypes
  * and RAWTEXT elements (script/style) are skipped like html5ever does.
  */
object HtmlTok {

  final case class Links(pageLinks: Vector[String], imageLinks: Vector[String])

  private val rawTextTags = Set("script", "style", "textarea", "title")

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
          // comment or doctype
          if (html.startsWith("<!--", lt)) i = skipTo("-->", lt + 4)
          else i = skipTo(">", lt + 2)
        } else if (c == '/') {
          i = skipTo(">", lt + 2)
        } else if (c == '?') {
          i = skipTo(">", lt + 2)
        } else if (c.isLetter) {
          // start tag: name
          var j = lt + 1
          while (j < n && (html.charAt(j).isLetterOrDigit || html.charAt(j) == '-')) j += 1
          val name = html.substring(lt + 1, j).toLowerCase
          // attributes
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
              if (aname == "href" && name == "a") page += decodeEntities(avalue)
              if (aname == "src" && name == "img") img += decodeEntities(avalue)
            }
          }
          i = j
          if (rawTextTags.contains(name)) i = skipTo("</" + name, i)
        } else {
          i = lt + 1
        }
      }
    }
    Links(page.result(), img.result())
  }

  /** html5ever decodes character references in attribute values; our
    * synthetic space only ever emits &amp; — decode the common ones. */
  private def decodeEntities(s: String): String =
    if (s.indexOf('&') < 0) s
    else s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
}
