package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** 14 SURT goldens ported from /root/reference/test/testUtils.test.ts:97-173. */
class SurtSpec extends AnyFunSuite {
  test("surt with www") {
    assert(UrlCanon.surt("https://www23.example.com/some/path") == "com,example)/some/path")
  }
  test("surt with www in middle") {
    assert(UrlCanon.surt("https://example.com/www2.example/some/value") == "com,example)/www2.example/some/value")
  }
  test("surt with www in middle host") {
    assert(UrlCanon.surt("https://abc.www.example.com/example") == "com,example,www,abc)/example")
  }
  test("surt with default port https") {
    assert(UrlCanon.surt("https://www.example.com:443/some/path") == "com,example)/some/path")
  }
  test("surt with default port http") {
    assert(UrlCanon.surt("http://www.example.com:80/some/path") == "com,example)/some/path")
  }
  test("surt with custom port") {
    assert(UrlCanon.surt("https://www.example.com:123/some/path") == "com,example:123)/some/path")
  }
  test("surt with query args sorted, lowercase") {
    assert(UrlCanon.surt("https://www.example.com/some/path?D=1&CC=2&EE=3") == "com,example)/some/path?cc=2&d=1&ee=3")
  }
  test("surt with no = param, lowercase") {
    assert(UrlCanon.surt("https://www.example.com/some/path?a=b&c&cc=1&d=e") == "com,example)/some/path?a=b&c&cc=1&d=e")
  }
  test("surt with no = param, sort") {
    assert(UrlCanon.surt("https://www.example.com/some/path?a=b&c=d&*&z") == "com,example)/some/path?*&a=b&c=d&z")
  }
  test("surt with ^ query, trailing = param") {
    assert(UrlCanon.surt("https://www.example.com/some/path?a=b&c=d&e^=&z") == "com,example)/some/path?a=b&c=d&e^=&z")
  }
  test("surt with ^ query, no trailing = param") {
    assert(UrlCanon.surt("https://www.example.com/some/path?a=b&c=d&e^&z") == "com,example)/some/path?a=b&c=d&e^&z")
  }
  test("surt with space") {
    assert(UrlCanon.surt("https://www.example.com/some/path?e+f=&a b&a+b=c&g^h=&d ") ==
      "com,example)/some/path?a%20b&a+b=c&d&e+f=&g^h=")
  }
  test("surt non-http passthrough") {
    assert(UrlCanon.surt("metadata://gnu.org/software/wget/warc/MANIFEST.txt") ==
      "metadata://gnu.org/software/wget/warc/MANIFEST.txt")
  }
  test("surt resource port fixture form") {
    assert(UrlCanon.surt("http://some.example.com:8080/") == "com,example,some:8080)/")
  }
  test("href normalization adds trailing slash") {
    assert(UrlCanon.hrefOrSelf("http://example.com") == "http://example.com/")
    assert(UrlCanon.hrefOrSelf("https://Example.COM:443/A/../b?q") == "https://example.com/b?q")
  }
}

/** jsonToQuery + postToGet goldens from testUtils.test.ts:9-95. */
class PostToGetSpec extends AnyFunSuite {
  private def toQuery(json: String) = PostToGet.jsonToQueryString(json)

  test("json to query simple") {
    assert(toQuery("""{"abc":"def","a":4}""") == "abc=def&a=4")
  }
  test("json to query with dupes") {
    assert(toQuery("""{"abc":"def","a":4,"foo":{"bar":"123","a":"5"}}""") == "abc=def&a=4&bar=123&a.2_=5")
  }
  test("json to query with more dupes") {
    assert(toQuery("""{"abc":"def","some":{"data":"bar","bar":2,"a":3},"a":"4","foo":{"bar":"123","a":"5"}}""") ==
      "abc=def&data=bar&bar=2&a=3&a.2_=4&bar.2_=123&a.3_=5")
  }
  test("another json with more complicated data") {
    assert(toQuery(
      """{"type":"event","id":44.0,"float":35.7,"values":[true,false,null],
        |"source":{"type":"component","id":"a+b&c= d","values":[3,4]}}""".stripMargin) ==
      "type=event&id=44&float=35.7&values=true&values.2_=false&values.3_=null&type.2_=component&id.2_=a%2Bb%26c%3D+d&values.4_=3&values.5_=4")
  }
  test("post-to-get empty") {
    val r = PostToGet.postToGetUrl("https://example.com/path/file", "POST",
      Seq.empty, Array.emptyByteArray).get
    assert(r.url == "https://example.com/path/file?__wb_method=POST&__wb_post_data=")
  }
  test("post-to-get binary") {
    val r = PostToGet.postToGetUrl("https://example.com/path/file", "POST",
      Seq(("Content-Type", "application/octet-stream")),
      Array[Byte](0x01, 0x02, 0x03, 0x04, 0x05, 0x06)).get
    assert(r.url == "https://example.com/path/file?__wb_method=POST&__wb_post_data=AQIDBAUG")
  }
  test("post-to-get bad query string") {
    val r = PostToGet.postToGetUrl("https://example.com/path/file", "POST",
      Seq(("Content-Type", "application/x-www-form-urlencoded")),
      "a=b&c=%ac".getBytes("UTF-8")).get
    assert(r.url == "https://example.com/path/file?__wb_method=POST&")
  }
  test("GET is not rewritten") {
    assert(PostToGet.postToGetUrl("https://x.com/", "GET", Seq.empty, Array.emptyByteArray).isEmpty)
  }
}

/** surtOfParsed must equal surt(href) for every parseable URL. */
class SurtEquivalenceSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("surtOfParsed == surt(href) over a seeded URL sweep") {
    val rnd = new scala.util.Random(11)
    val hosts = Seq("www.example.com", "www2.Example.org", "a.b.c.example.net",
      "host5.example.org", "www.example.com:8443", "example.com:80")
    for (_ <- 1 to 2000) {
      val scheme = if (rnd.nextBoolean()) "https" else "http"
      val host = hosts(rnd.nextInt(hosts.size))
      val path = (0 until rnd.nextInt(4)).map(_ => s"Seg${rnd.nextInt(50)}").mkString("/", "/", "")
      val query = if (rnd.nextBoolean()) "?" + (0 until (1 + rnd.nextInt(4)))
        .map(i => s"K${rnd.nextInt(20)}=v${rnd.nextInt(9)}").mkString("&") else ""
      val url = s"$scheme://$host$path$query"
      UrlCanon.parse(url).foreach { u =>
        assert(UrlCanon.surtOfParsed(u) == UrlCanon.surt(u.href), s"mismatch for $url")
      }
    }
  }
}
