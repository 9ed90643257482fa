package graft.core

import scala.collection.mutable

/** One parsed header line. Order and duplicates are preserved — the Spark
  * schema for headers is Array[Struct[name,value]] for exactly this
  * reason (a MapType would lose both). */
final case class HeaderKV(name: String, value: String)

/** A parsed statusline + ordered header block.
  * Behavior reference (studied, not copied):
  * /root/reference/src/lib/statusandheaders.ts:117-216 (parser quirks:
  * continuation lines, colon-less drops, latin1 re-encode fallback) and
  * the Fetch `Headers` semantics the default (non-keepHeadersCase) path
  * stores into. */
final case class StatusAndHeaders(
    statusline: String,
    headers: Vector[HeaderKV],
    reencoded: Set[String] // lowercased names re-encoded to latin1
) {
  /** Fetch Headers `get`: case-insensitive; multiple values joined ", ". */
  def get(name: String): Option[String] = {
    val matches = headers.iterator.filter(_.name.equalsIgnoreCase(name)).map(_.value).toList
    if (matches.isEmpty) None else Some(matches.mkString(", "))
  }

  /** statusline as an HTTP response line: protocol, status code, text.
    * (split with remainder — statusText keeps embedded spaces). */
  lazy val (protocol: String, statusCodeRaw: String, statusText: String) = {
    val parts = statusline.split(" ", 3)
    (parts.lift(0).getOrElse(""), parts.lift(1).getOrElse(""), parts.lift(2).getOrElse(""))
  }
  /** JS `Number(parts[1])` observable: integer when parseable. */
  def statusCode: Option[Int] =
    try { val t = statusCodeRaw.trim; if (t.isEmpty) None else Some(t.toInt) }
    catch { case _: Exception => None }

  /** statusline as an HTTP request line: method + path. */
  lazy val (method: String, requestPath: String) = {
    val parts = statusline.split(" ", 3) // JS split(" ", 2) — limit keeps first 2
    (parts.lift(0).getOrElse(""), parts.lift(1).getOrElse(""))
  }

  /** Serialize: statusline + "name: value" lines, CRLF-joined + trailing
    * CRLF. latin1-re-encoded headers are converted back to UTF-8. */
  def serialize: String = {
    val sb = new StringBuilder(statusline)
    for (HeaderKV(n, v) <- headers) {
      sb.append("\r\n").append(n).append(": ")
      sb.append(if (reencoded.contains(n.toLowerCase)) JsCompat.latin1ToUtf(v) else v)
    }
    sb.append("\r\n").toString
  }
}

object WarcHeaders {
  /** RFC 7230 token chars — Fetch Headers rejects names outside this. */
  private def isTokenName(name: String): Boolean =
    name.nonEmpty && name.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        "!#$%&'*+-.^_`|~".indexOf(c) >= 0)

  private def isValidValue(v: String): Boolean =
    !v.exists(c => c == '\u0000' || c == '\r' || c == '\n')

  /** Parse a decoded header block (everything after the statusline, up to
    * and including the blank line). Quirks preserved:
    *  - continuation lines (leading space/tab) append with trailing trim,
    *    keeping the continuation's leading whitespace;
    *  - lines without a colon before the newline are dropped and flush
    *    any pending value;
    *  - names are trimStart-ed only; values trimmed both ends;
    *  - Fetch-Headers storage: invalid token names dropped; values with
    *    chars > 0xFF re-encoded as latin1 and flagged. */
  private val WARC_ALLOWED_MULTI = Set("warc-concurrent-to", "warc-protocol")

  /** `keepCase=false` (default, matching the CLI parser): Fetch-Headers
    * storage — invalid token names dropped, values with chars > 0xFF
    * re-encoded latin1 + flagged. `keepCase=true`: HeadersMultiMap —
    * everything kept verbatim except duplicate non-allowlisted `warc-*`
    * names (2nd+ occurrence dropped, matching the reference's swallowed
    * append error, utils.ts:333-348). */
  def parseHeaderBlock(headerBuff: String, keepCase: Boolean = false): (Vector[HeaderKV], Set[String]) = {
    val out = Vector.newBuilder[HeaderKV]
    val seen = mutable.Set.empty[String]
    val reenc = mutable.Set.empty[String]

    def store(name: String, value: String): Unit = {
      if (keepCase) {
        val lower = name.toLowerCase
        if (seen.contains(lower) && lower.startsWith("warc-") && !WARC_ALLOWED_MULTI.contains(lower)) return
        seen += lower
        out += HeaderKV(name, value)
        return
      }
      if (!isTokenName(name)) return // Headers.append throws → dropped
      if (isValidValue(value) && !value.exists(_ > 0xff)) out += HeaderKV(name, value)
      else {
        val re = JsCompat.utfToLatin1(value)
        if (isValidValue(re)) { out += HeaderKV(name, re); reenc += name.toLowerCase }
        // else: dropped silently (second append also failed)
      }
    }

    var start = 0
    var name = ""
    var value: String = null
    val n = headerBuff.length
    var done = false
    while (start < n && !done) {
      val valueEnd = headerBuff.indexOf('\n', start)
      val lineEnd = if (valueEnd < 0) n else valueEnd
      val c0 = headerBuff.charAt(start)
      // JS truthiness: an empty pending value does not continue
      if (value != null && value.nonEmpty && (c0 == ' ' || c0 == '\t')) {
        value = value + rtrim(headerBuff.substring(start, lineEnd))
      } else {
        if (value != null && value.nonEmpty) { store(name, value) }
        value = null
        val nameEnd = headerBuff.indexOf(':', start)
        if (nameEnd >= 0 && (valueEnd < 0 || nameEnd < valueEnd)) {
          name = ltrim(headerBuff.substring(start, nameEnd))
          value = headerBuff.substring(nameEnd + 1, lineEnd).trim
        } else value = null
      }
      if (valueEnd < 0) done = true else start = valueEnd + 1
    }
    if (value != null && value.nonEmpty) store(name, value)
    (out.result(), reenc.toSet)
  }

  private def rtrim(s: String): String = {
    var e = s.length
    while (e > 0 && Character.isWhitespace(s.charAt(e - 1))) e -= 1
    s.substring(0, e)
  }
  private def ltrim(s: String): String = {
    var b = 0
    while (b < s.length && Character.isWhitespace(s.charAt(b))) b += 1
    s.substring(b)
  }
}
