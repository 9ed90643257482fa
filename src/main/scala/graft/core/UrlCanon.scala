package graft.core

/** WHATWG-style URL normalizer + SURT (Sort-friendly URI Reordering
  * Transform) canonicalizer.
  *
  * The reference delegates to the platform `new URL(...)` (WHATWG); we
  * implement the observable subset its SURT + record-create goldens
  * exercise: trim, tab/newline strip, scheme/host lowercasing, default
  * port removal, dot-segment resolution, path/query percent-encoding,
  * userinfo handling, trailing-slash for empty paths.
  *
  * Behavior references (studied, not copied):
  *  - /root/reference/src/lib/utils.ts:31-56 (getSurt)
  *  - /root/reference/src/lib/warcrecord.ts:89-95 (create URL normalize)
  *  - /root/reference/test/testUtils.test.ts:97-173 (14 SURT goldens)
  */
object UrlCanon {

  final case class Url(
      scheme: String,
      userinfo: String, // "" if none; serialized before '@'
      host: String,
      port: Option[Int], // None when default for scheme
      path: String, // always starts with "/" for special schemes
      query: Option[String], // without leading '?'
      fragment: Option[String] // without leading '#'
  ) {
    def href: String = {
      val sb = new StringBuilder
      sb.append(scheme).append("://")
      if (userinfo.nonEmpty) sb.append(userinfo).append('@')
      sb.append(host)
      port.foreach(p => sb.append(':').append(p))
      sb.append(path)
      query.foreach(q => sb.append('?').append(q))
      fragment.foreach(f => sb.append('#').append(f))
      sb.toString
    }
    def search: String = query.filter(_.nonEmpty).map("?" + _).getOrElse("")
  }

  private val DEFAULT_PORTS = Map("http" -> 80, "https" -> 443, "ws" -> 80, "wss" -> 443, "ftp" -> 21)

  /** Chars (besides controls/non-ASCII) percent-encoded in the PATH. */
  private val PATH_ENCODE: Set[Char] = Set(' ', '"', '<', '>', '`', '#', '?', '{', '}')

  /** Chars (besides controls/non-ASCII) percent-encoded in the QUERY of a
    * special URL ('\'' included for special schemes per WHATWG). */
  private val QUERY_ENCODE: Set[Char] = Set(' ', '"', '<', '>', '#', '\'')

  private def pctEncode(s: String, extra: Set[Char]): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x20 || c == 0x7f || extra.contains(c)) {
        for (b <- c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          sb.append(f"%%${b & 0xff}%02X")
      } else if (c > 0x7e) {
        // non-ASCII → UTF-8 percent-encode (surrogate pairs handled via
        // codepoint-wise encoding)
        val cp = if (Character.isHighSurrogate(c) && i + 1 < s.length &&
                     Character.isLowSurrogate(s.charAt(i + 1))) {
          val v = Character.toCodePoint(c, s.charAt(i + 1)); i += 1; v
        } else c.toInt
        for (b <- new String(Character.toChars(cp)).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          sb.append(f"%%${b & 0xff}%02X")
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Resolve "." and ".." segments the way the WHATWG path state does. */
  private def resolveDots(segments: List[String]): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    for (seg <- segments) {
      val lower = seg.toLowerCase
      val isDot = seg == "." || lower == "%2e"
      val isDotDot = Set("..", ".%2e", "%2e.", "%2e%2e").contains(lower)
      if (isDotDot) { if (out.nonEmpty) out.remove(out.length - 1) }
      else if (!isDot) out += seg
    }
    out.toList
  }

  /** Parse + normalize. Returns None where `new URL(...)` would throw. */
  def parse(rawInput: String): Option[Url] = {
    if (rawInput == null) return None
    // 1. trim C0 controls + space; strip interior tab/LF/CR
    var input = rawInput
    var a = 0
    var b = input.length
    while (a < b && input.charAt(a) <= ' ') a += 1
    while (b > a && input.charAt(b - 1) <= ' ') b -= 1
    input = input.substring(a, b).filterNot(c => c == '\t' || c == '\n' || c == '\r')

    // 2. scheme
    val colon = input.indexOf(':')
    if (colon <= 0) return None
    val schemeRaw = input.substring(0, colon)
    if (!schemeRaw.head.isLetter || !schemeRaw.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.'))
      return None
    val scheme = schemeRaw.toLowerCase
    if (!DEFAULT_PORTS.contains(scheme)) return None // only special web schemes normalized here
    var rest = input.substring(colon + 1)
    // special scheme: any number of leading slashes/backslashes
    rest = rest.dropWhile(c => c == '/' || c == '\\')

    // 3. authority: up to '/', '\', '?', '#'
    val authEnd = rest.indexWhere(c => c == '/' || c == '\\' || c == '?' || c == '#') match {
      case -1 => rest.length
      case n  => n
    }
    val authority = rest.substring(0, authEnd)
    val afterAuth = rest.substring(authEnd)

    val (userinfo, hostport) = authority.lastIndexOf('@') match {
      case -1 => ("", authority)
      case n  => (authority.substring(0, n), authority.substring(n + 1))
    }
    if (hostport.isEmpty) return None
    // 4. host / port (IPv6 brackets: keep verbatim)
    val (hostRaw, portRaw) =
      if (hostport.startsWith("[")) {
        val close = hostport.indexOf(']')
        if (close < 0) return None
        val hp = hostport.substring(close + 1)
        if (hp.startsWith(":")) (hostport.substring(0, close + 1), Some(hp.substring(1)))
        else if (hp.isEmpty) (hostport, None)
        else return None
      } else hostport.indexOf(':') match {
        case -1 => (hostport, None)
        case n  => (hostport.substring(0, n), Some(hostport.substring(n + 1)))
      }
    if (hostRaw.isEmpty) return None
    if (hostRaw.exists(c => c == ' ' || c == '<' || c == '>' || c == '^' || c == '|' ||
        c == '"' || c == '#' || c == '/' || c == '?' || c < 0x21)) return None
    val host = hostRaw.toLowerCase
    val port: Option[Int] = portRaw match {
      case None => None
      case Some("") => None // "host:" → default port
      case Some(p) =>
        if (!p.forall(_.isDigit)) return None
        val v = try p.toInt catch { case _: Exception => return None }
        if (v > 65535) return None
        if (DEFAULT_PORTS.get(scheme).contains(v)) None else Some(v)
    }

    // 5. split path / query / fragment
    val hashIdx = afterAuth.indexOf('#')
    val (beforeHash, fragment) =
      if (hashIdx < 0) (afterAuth, None)
      else (afterAuth.substring(0, hashIdx), Some(afterAuth.substring(hashIdx + 1)))
    val qIdx = beforeHash.indexOf('?')
    val (pathPart, query) =
      if (qIdx < 0) (beforeHash, None)
      else (beforeHash.substring(0, qIdx), Some(beforeHash.substring(qIdx + 1)))

    // 6. path normalize: backslash → slash, dot segments, encode
    val normSlashes = pathPart.replace('\\', '/')
    val segs = normSlashes.split("/", -1).toList.drop(if (normSlashes.startsWith("/")) 1 else 0)
    val trailingSlash = normSlashes.endsWith("/") || segs.lastOption.exists(s => s == "." || s == ".." ||
      Set("%2e", ".%2e", "%2e.", "%2e%2e").contains(s.toLowerCase))
    val resolved = resolveDots(segs)
    val encoded = resolved.map(pctEncode(_, PATH_ENCODE))
    val path0 = "/" + encoded.mkString("/")
    val path =
      if (trailingSlash && !path0.endsWith("/")) path0 + "/"
      else if (path0.isEmpty) "/"
      else path0

    val queryEnc = query.map(pctEncode(_, QUERY_ENCODE))
    val fragEnc = fragment.map(pctEncode(_, Set(' ', '"', '<', '>', '`')))

    Some(Url(scheme, userinfo, host, port, path, queryEnc, fragEnc))
  }

  /** `new URL(url).href` with the reference's fallback: on parse failure
    * return the input unchanged
    * (/root/reference/src/lib/warcrecord.ts:89-95). */
  def hrefOrSelf(url: String): String = parse(url).map(_.href).getOrElse(url)

  private val WWW_RE = "^(https?://)www\\d*\\.".r

  /** Strip a leading `www`/`wwwN.` host label (the SURT www rule). */
  private def stripWww(host: String): String = {
    if (!host.startsWith("www")) return host
    var i = 3
    while (i < host.length && host.charAt(i).isDigit) i += 1
    if (i < host.length && host.charAt(i) == '.') host.substring(i + 1) else host
  }

  /** SURT computed from an ALREADY-PARSED, normalized URL — equivalent
    * to `surt(u.href)` for parse outputs (normalization is idempotent)
    * but skips the second parse and the www regex. The frontier hot
    * path uses this. */
  def surtOfParsed(u: Url): String = {
    if (u.scheme != "http" && u.scheme != "https") return u.href
    val host = stripWww(u.host)
    val sb = new StringBuilder(u.href.length)
    // reversed host labels joined by ','
    var end = host.length
    var first = true
    var i = host.length - 1
    while (i >= 0) {
      if (host.charAt(i) == '.') {
        if (!first) sb.append(',')
        sb.append(host.substring(i + 1, end))
        first = false
        end = i
      }
      i -= 1
    }
    if (!first) sb.append(',')
    sb.append(host.substring(0, end))
    u.port.foreach(p => sb.append(':').append(p))
    sb.append(')')
    sb.append(u.path.toLowerCase(java.util.Locale.ROOT))
    u.query.filter(_.nonEmpty).foreach { q =>
      val args = q.toLowerCase(java.util.Locale.ROOT).split("&", -1)
      java.util.Arrays.sort(args.asInstanceOf[Array[Object]])
      sb.append('?').append(args.mkString("&"))
    }
    sb.toString
  }

  /** SURT per /root/reference/src/lib/utils.ts:31-56: http(s) only; strip
    * a leading `www\d*.`; lowercase the WHOLE url; reversed host labels
    * joined by ','; non-default `:port`; `)` + pathname; query args
    * lexicographically sorted. Any failure → the www-stripped url. */
  def surt(rawUrl: String): String = {
    if (rawUrl == null) return null
    if (!rawUrl.startsWith("https:") && !rawUrl.startsWith("http:")) return rawUrl
    val url = WWW_RE.replaceFirstIn(rawUrl, "$1")
    parse(url.toLowerCase(java.util.Locale.ROOT)) match {
      case None => url
      case Some(u) =>
        val sb = new StringBuilder
        sb.append(u.host.split("\\.", -1).reverse.mkString(","))
        u.port.foreach(p => sb.append(':').append(p))
        sb.append(')')
        sb.append(u.path)
        val search = u.search
        if (search.nonEmpty) {
          val args = search.substring(1).split("&", -1).sorted(Ordering.String)
          sb.append('?').append(args.mkString("&"))
        }
        sb.toString
    }
  }
}
