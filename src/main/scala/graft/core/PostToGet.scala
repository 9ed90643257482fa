package graft.core

import scala.collection.mutable
import JsValue._

/** URLSearchParams-alike with insertion order + `set` semantics, only what
  * the POST→GET rewrite observes. */
final class SearchParams {
  private val order = mutable.LinkedHashMap.empty[String, String]
  def has(key: String): Boolean = order.contains(key)
  def set(key: String, value: String): Unit = order(key) = value
  def isEmpty: Boolean = order.isEmpty
  /** x-www-form-urlencoded serialization (space→'+', UTF-8 %XX). */
  override def toString: String =
    order.iterator
      .map { case (k, v) => JsCompat.formEncode(k) + "=" + JsCompat.formEncode(v) }
      .mkString("&")
}

/** POST→GET URL rewrite: converts a captured POST/PUT request into a
  * GET-with-query form for CDX urlkeys.
  *
  * Behavior reference (studied, not copied):
  * /root/reference/src/lib/utils.ts:58-155 (postToGetUrl/appendRequestQuery),
  * :157-226 (jsonToQueryParams), :228-256 (mfdToQueryParams);
  * goldens /root/reference/test/testUtils.test.ts:9-95,
  * /root/reference/test/testIndexer.test.ts:175-200. */
object PostToGet {

  /** Recursive JSON→query flattening. Duplicate keys become `key.N_`
    * (N starting at 2); arrays reuse the parent key; null→"null"; empty
    * string values are dropped. */
  def jsonToQueryParams(json: Either[String, JsValue]): SearchParams = {
    val q = new SearchParams
    val dupes = mutable.HashMap.empty[String, Int]
    def getKey(key: String): String =
      if (!q.has(key)) key
      else {
        val n = dupes.getOrElse(key, 1) + 1
        dupes(key) = n
        s"$key.${n}_"
      }
    def emit(key: String, value: String): Unit =
      if (value.nonEmpty) q.set(getKey(key), value)
    def walk(v: JsValue, key: String): Unit = v match {
      case JsObj(fields) => fields.foreach { case (k, child) => walk(child, k) }
      case JsArr(items)  => items.foreach(walk(_, key))
      case JsNull        => emit(key, "null")
      case JsBool(b)     => emit(key, if (b) "true" else "false")
      case JsNum(d)      => emit(key, JsCompat.jsNumberToString(d))
      case JsStr(s)      => emit(key, s)
    }
    json match {
      case Right(v) => walk(v, "")
      case Left(_)  => // JSON.parse failed → json = {} → nothing emitted
    }
    q
  }

  def jsonToQueryString(body: String): String =
    jsonToQueryParams(Json.parse(body)).toString

  /** multipart/form-data → query params: split on the boundary, capture
    * `name="..."` + the first line after the blank line. */
  def mfdToQueryString(mfd: String, contentType: String): String = {
    val q = new SearchParams
    try {
      val boundaryParts = contentType.split("boundary=", 2)
      if (boundaryParts.length < 2) return q.toString
      val boundary = boundaryParts(1)
      val splitter = ("(?mi)-*" + java.util.regex.Pattern.quote(boundary) + "-*").r
      val nameRe = "(?is)name=\"([^\"]+)\"\r\n\r\n(.*)".r.unanchored
      for (part <- splitter.split(mfd)) {
        // `.` does not cross newlines in the reference regex: value is the
        // first line after the blank separator
        part.trim match {
          case nameRe(name, rest) =>
            val value = rest.takeWhile(c => c != '\r' && c != '\n')
            q.set(name, value)
          case _ =>
        }
      }
    } catch { case _: Exception => }
    q.toString
  }

  /** binary body fallback: `__wb_post_data=` + btoa(latin1(body)). */
  def binaryToString(postData: Array[Byte]): String =
    "__wb_post_data=" + JsCompat.btoa(JsCompat.bytesToBinaryString(postData)).getOrElse("")

  final case class Rewritten(url: String, method: String, requestBody: String)

  /** Case-insensitive content-type lookup over ordered headers. */
  private def contentTypeOf(headers: Seq[(String, String)]): String =
    headers.collectFirst { case (k, v) if k != null && k.equalsIgnoreCase("content-type") => v }
      .getOrElse("")

  /** Core rewrite. Returns None for GET (no rewrite). `maxQuerySize` 0
    * disables truncation. */
  def postToGetUrl(
      url: String,
      method: String,
      headers: Seq[(String, String)],
      postData: Array[Byte],
      maxQuerySize: Int = 0
  ): Option[Rewritten] = {
    if (method == "GET") return None
    val contentType = contentTypeOf(headers)
    val requestMime = contentType.split(";", 2)(0)
    val bodyText = new String(
      if (postData == null) Array.emptyByteArray else postData,
      java.nio.charset.StandardCharsets.UTF_8)

    val query0: String = requestMime match {
      case "application/x-www-form-urlencoded" => bodyText
      case "application/json" => jsonToQueryString(bodyText)
      case "text/plain" =>
        // reference: jsonToQueryString(…, ignoreInvalid=false); its JSON
        // failures collapse to {} rather than throwing, so this matches
        try jsonToQueryString(bodyText)
        catch { case _: Exception => binaryToString(postData) }
      case "multipart/form-data" =>
        if (contentType.isEmpty)
          throw new IllegalArgumentException(
            "utils cannot call postToGetURL when missing content-type header")
        mfdToQueryString(bodyText, contentType)
      case _ => binaryToString(if (postData == null) Array.emptyByteArray else postData)
    }

    var query = query0
    if (maxQuerySize > 0 && query.length > maxQuerySize)
      query = query.substring(0, maxQuerySize)
    val requestBody = query
    // decodeURI the query for the URL; invalid escapes clear it entirely
    val decoded = try JsCompat.decodeURI(query) catch { case _: Exception => "" }
    val newUrl = appendRequestQuery(url, decoded, method)
    Some(Rewritten(newUrl, "GET", requestBody))
  }

  def appendRequestQuery(url: String, query: String, method: String): String = {
    if (method == null || method.isEmpty) return url
    val start = if (url.indexOf('?') > 0) "&" else "?"
    s"$url${start}__wb_method=$method&$query"
  }
}
