package graft.core

import java.nio.charset.StandardCharsets

/** JavaScript-compatible primitives the reference's observable behavior
  * depends on: Number→string formatting, `encodeURIComponent`-family
  * escaping, `decodeURI`, `btoa`, latin1↔UTF-8 re-encoding.
  *
  * Behavior references (studied, not copied):
  *  - /root/reference/src/lib/utils.ts:3-25 (binaryToString/btoa)
  *  - /root/reference/src/lib/utils.ts:300-315 (UTFToLatin1/latin1ToUTF)
  *  - WHATWG URL / ECMA-262 for the escaping + number formatting rules.
  */
object JsCompat {

  /** ECMA-262 Number::toString(10) for the doubles that appear in JSON
    * bodies: integral values print without a fraction ("44"), others use
    * the shortest decimal form ("35.7"); exponent form only outside
    * [1e-6, 1e21). */
  def jsNumberToString(d: Double): String = {
    if (d.isNaN) return "NaN"
    if (d.isInfinite) return if (d > 0) "Infinity" else "-Infinity"
    if (d == 0.0) return if (1 / d < 0) "0" else "0"
    if (d == Math.rint(d) && Math.abs(d) < 1e21) {
      // integral magnitude: print as integer (no decimal point)
      if (Math.abs(d) <= 9.007199254740992e15) return BigDecimal(d).toBigInt.toString
      // large integral doubles: fall through to decimal expansion
      return BigDecimal(d).bigDecimal.toPlainString
    }
    // Shortest-roundtrip via Java's Double.toString (shortest since JDK 19;
    // on 17 it is near-shortest and exact for common literals), then JS
    // exponent formatting rules.
    val s = java.lang.Double.toString(d)
    if (!s.contains("E")) {
      // Java prints e.g. "35.7" — matches JS within the non-exponent range
      if (s.endsWith(".0")) s.dropRight(2) else s
    } else {
      // Java "3.5E-5" → JS "0.000035" for exponents in (-7, 21)
      val bd = new java.math.BigDecimal(s)
      val exp = Math.floor(Math.log10(Math.abs(d))).toInt
      if (exp >= -7 && exp < 21) bd.stripTrailingZeros.toPlainString
      else s.replace("E", "e").replace("e-", "e-").replace("e", if (exp >= 0) "e+" else "e")
    }
  }

  /** application/x-www-form-urlencoded serializer escaping, as used by
    * URLSearchParams.toString(): UTF-8 bytes; keep [A-Za-z0-9*\-._];
    * space → '+'; everything else %XX uppercase. */
  def formEncode(s: String): String = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    val sb = new StringBuilder(bytes.length)
    for (b <- bytes) {
      val c = b & 0xff
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
          c == '*' || c == '-' || c == '.' || c == '_') sb.append(c.toChar)
      else if (c == ' ') sb.append('+')
      else sb.append(f"%%$c%02X")
    }
    sb.toString
  }

  private val DECODE_URI_RESERVED: Set[Char] = "#$&+,/:;=?@".toSet

  /** ECMA-262 decodeURI: decode %XX UTF-8 sequences except those that
    * decode to a reserved character (kept verbatim, original hex case).
    * Malformed sequences throw (caller clears the query on failure, see
    * /root/reference/src/lib/utils.ts:132-137). */
  def decodeURI(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    def hexAt(j: Int): Int = {
      if (j + 2 >= n) throw new IllegalArgumentException("URIError: truncated escape")
      val h = Character.digit(s.charAt(j + 1), 16)
      val l = Character.digit(s.charAt(j + 2), 16)
      if (h < 0 || l < 0) throw new IllegalArgumentException("URIError: bad hex")
      (h << 4) | l
    }
    while (i < n) {
      val c = s.charAt(i)
      if (c != '%') { sb.append(c); i += 1 }
      else {
        val start = i
        val b0 = hexAt(i)
        i += 3
        if ((b0 & 0x80) == 0) {
          val ch = b0.toChar
          if (DECODE_URI_RESERVED.contains(ch)) sb.append(s, start, start + 3)
          else sb.append(ch)
        } else {
          // multi-byte UTF-8: count continuation bytes
          val extra =
            if ((b0 & 0xe0) == 0xc0) 1
            else if ((b0 & 0xf0) == 0xe0) 2
            else if ((b0 & 0xf8) == 0xf0) 3
            else throw new IllegalArgumentException("URIError: bad leading byte")
          val buf = new Array[Byte](1 + extra)
          buf(0) = b0.toByte
          var k = 0
          while (k < extra) {
            if (i >= n || s.charAt(i) != '%') throw new IllegalArgumentException("URIError: missing continuation")
            val bk = hexAt(i)
            if ((bk & 0xc0) != 0x80) throw new IllegalArgumentException("URIError: bad continuation")
            buf(1 + k) = bk.toByte
            i += 3
            k += 1
          }
          val decoded = new String(buf, StandardCharsets.UTF_8)
          if (decoded.contains('�')) throw new IllegalArgumentException("URIError: invalid UTF-8")
          sb.append(decoded)
        }
      }
    }
    sb.toString
  }

  /** btoa over a latin1 string (chars must be <= 0xFF, else None —
    * reference swallows the error and emits an empty post blob,
    * /root/reference/src/lib/utils.ts:19-24). */
  def btoa(s: String): Option[String] = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c > 0xff) return None
      bytes(i) = c.toByte
      i += 1
    }
    Some(java.util.Base64.getEncoder.encodeToString(bytes))
  }

  /** bytes → latin1 "binary string" (String.fromCharCode per byte). */
  def bytesToBinaryString(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length)
    for (b <- bytes) sb.append((b & 0xff).toChar)
    sb.toString
  }

  /** UTF-8 encode then reinterpret each byte as a char (reference
    * UTFToLatin1 — used for the header latin1 fallback). */
  def utfToLatin1(value: String): String =
    bytesToBinaryString(value.getBytes(StandardCharsets.UTF_8))

  /** chars &0xFF as bytes, decoded as UTF-8 (reference latin1ToUTF). */
  def latin1ToUtf(s: String): String = {
    val buf = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) { buf(i) = (s.charAt(i) & 0xff).toByte; i += 1 }
    new String(buf, StandardCharsets.UTF_8)
  }
}
