package graft.core

import scala.collection.mutable

/** Minimal JSON parser with JS `JSON.parse` observable semantics for the
  * POST→GET rewrite (numbers as doubles, insertion-ordered objects,
  * last-duplicate-wins). Tolerances match JSON.parse (strict grammar).
  * Behavior reference: /root/reference/src/lib/utils.ts:157-226. */
sealed trait JsValue
object JsValue {
  case object JsNull extends JsValue
  final case class JsBool(v: Boolean) extends JsValue
  final case class JsNum(v: Double) extends JsValue
  final case class JsStr(v: String) extends JsValue
  final case class JsArr(v: Vector[JsValue]) extends JsValue
  final case class JsObj(v: Vector[(String, JsValue)]) extends JsValue
}

object Json {
  import JsValue._

  def parse(s: String): Either[String, JsValue] =
    try {
      val p = new Parser(s)
      val v = p.parseValue()
      p.skipWs()
      if (!p.atEnd) Left("trailing content") else Right(v)
    } catch { case e: Exception => Left(e.getMessage) }

  private final class Parser(s: String) {
    private var i = 0
    def atEnd: Boolean = i >= s.length
    def skipWs(): Unit = {
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
             s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    }
    private def fail(msg: String): Nothing = throw new IllegalArgumentException(s"$msg at $i")
    private def expect(c: Char): Unit = {
      if (atEnd || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }

    def parseValue(): JsValue = {
      skipWs()
      if (atEnd) fail("unexpected end")
      s.charAt(i) match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => JsStr(parseString())
        case 't' => lit("true"); JsBool(true)
        case 'f' => lit("false"); JsBool(false)
        case 'n' => lit("null"); JsNull
        case c if c == '-' || (c >= '0' && c <= '9') => parseNumber()
        case c => fail(s"unexpected '$c'")
      }
    }

    private def lit(word: String): Unit = {
      if (!s.startsWith(word, i)) fail(s"expected $word")
      i += word.length
    }

    private def parseObject(): JsObj = {
      expect('{'); skipWs()
      val buf = mutable.LinkedHashMap.empty[String, JsValue]
      if (!atEnd && s.charAt(i) == '}') { i += 1; return JsObj(buf.toVector) }
      var done = false
      while (!done) {
        skipWs()
        val k = parseString()
        skipWs(); expect(':')
        val v = parseValue()
        buf(k) = v // duplicate keys: last value wins, first position kept
        skipWs()
        if (!atEnd && s.charAt(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      JsObj(buf.toVector)
    }

    private def parseArray(): JsArr = {
      expect('['); skipWs()
      val buf = Vector.newBuilder[JsValue]
      if (!atEnd && s.charAt(i) == ']') { i += 1; return JsArr(buf.result()) }
      var done = false
      while (!done) {
        buf += parseValue()
        skipWs()
        if (!atEnd && s.charAt(i) == ',') i += 1
        else { expect(']'); done = true }
      }
      JsArr(buf.result())
    }

    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (true) {
        if (atEnd) fail("unterminated string")
        val c = s.charAt(i)
        if (c == '"') { i += 1; return sb.toString }
        else if (c == '\\') {
          i += 1
          if (atEnd) fail("bad escape")
          s.charAt(i) match {
            case '"'  => sb.append('"'); i += 1
            case '\\' => sb.append('\\'); i += 1
            case '/'  => sb.append('/'); i += 1
            case 'b'  => sb.append('\b'); i += 1
            case 'f'  => sb.append('\f'); i += 1
            case 'n'  => sb.append('\n'); i += 1
            case 'r'  => sb.append('\r'); i += 1
            case 't'  => sb.append('\t'); i += 1
            case 'u' =>
              if (i + 4 >= s.length) fail("bad unicode escape")
              val code = Integer.parseInt(s.substring(i + 1, i + 5), 16)
              sb.append(code.toChar); i += 5
            case c2 => fail(s"bad escape \\$c2")
          }
        } else if (c < 0x20) fail("control char in string")
        else { sb.append(c); i += 1 }
      }
      sb.toString
    }

    private def parseNumber(): JsNum = {
      val start = i
      if (!atEnd && s.charAt(i) == '-') i += 1
      while (!atEnd && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      if (!atEnd && s.charAt(i) == '.') {
        i += 1
        while (!atEnd && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      }
      if (!atEnd && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (!atEnd && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        while (!atEnd && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      }
      if (i == start) fail("bad number")
      JsNum(java.lang.Double.parseDouble(s.substring(start, i)))
    }
  }
}
