package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.io.{ByteArrayInputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** The streaming parser must be byte-equivalent to the batch kernel
  * (which carries the reference-fixture goldens) AND hold O(one record)
  * of memory. */
class WarcStreamingSpec extends AnyFunSuite {

  private val fixtures = Seq(
    "example.warc", "example.warc.gz", "example-bad-length.warc",
    "example-iana.org-chunked.warc", "example-resource.warc.gz",
    "example-url-agnostic-revisit.warc.gz", "example-wget-bad-target-uri.warc.gz",
    "post-test-more.warc", "post-test.warc.gz", "redirect.warc")

  private def fixtureBytes(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(getClass.getResource(s"/warcio/$name").getPath))

  private def key(r: FramedRecord) =
    (r.offset, r.length, r.warcVersion, r.warcHeaders, r.httpStatusline,
      r.httpHeaders, r.payload.toSeq, r.warning)

  test("parity with batch kernel on every reference fixture (both case modes)") {
    for (f <- fixtures; keepCase <- Seq(false, true)) {
      val bytes = fixtureBytes(f)
      val batch = WarcFraming.parseFile(bytes, f, WarcFraming.isGzipName(f), keepCase)
      val streamed = WarcStreaming.parseStream(new ByteArrayInputStream(bytes), f,
        WarcFraming.isGzipName(f), keepCase).toVector
      assert(streamed.size == batch.size, s"$f record count")
      for ((s, b) <- streamed.zip(batch))
        assert(key(s) == key(b), s"$f keepCase=$keepCase record mismatch")
    }
  }

  test("keepPayload=false: payloads skipped, all other fields identical") {
    for (f <- fixtures) {
      val bytes = fixtureBytes(f)
      val full = WarcStreaming.parseStream(new ByteArrayInputStream(bytes), f,
        WarcFraming.isGzipName(f)).toVector
      val pruned = WarcStreaming.parseStream(new ByteArrayInputStream(bytes), f,
        WarcFraming.isGzipName(f), keepPayload = false).toVector
      assert(pruned.size == full.size)
      for ((p, o) <- pruned.zip(full)) {
        assert(p.payload.isEmpty, s"$f payload not skipped")
        assert(key(p.copy(payload = Array.emptyByteArray)) ==
          key(o.copy(payload = Array.emptyByteArray)), s"$f pruned fields differ")
      }
    }
  }

  /** An InputStream that SYNTHESIZES records on the fly and counts bytes
    * served — proves the parser pulls O(one record), not the whole file:
    * after the first record, only ~2 records' worth of bytes may have
    * been requested (one + bounded lookahead/buffer). */
  private final class GeneratorStream(nRecords: Int, payloadSize: Int) extends InputStream {
    var served = 0L
    private var rec = 0
    private var cur: Array[Byte] = next0()
    private var pos = 0
    val recordSize: Int = cur.length
    private def next0(): Array[Byte] = {
      if (rec >= nRecords) return null
      val payload = ("x" * payloadSize).getBytes(StandardCharsets.UTF_8)
      val hdr = (s"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Record-ID: <urn:uuid:r$rec>\r\n" +
        f"WARC-Target-URI: https://ex.org/$rec%08d\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes(StandardCharsets.UTF_8)
      rec += 1
      hdr ++ payload ++ "\r\n\r\n".getBytes(StandardCharsets.UTF_8)
    }
    override def read(): Int = {
      if (cur == null) return -1
      val b = cur(pos) & 0xff
      pos += 1; served += 1
      if (pos >= cur.length) { cur = next0(); pos = 0 }
      b
    }
  }

  test("streaming-ness: first record emitted after O(record) bytes of a 100k-record stream") {
    val gen = new GeneratorStream(nRecords = 100000, payloadSize = 10000)
    val it = WarcStreaming.parseStream(gen, "synth.warc", isGzip = false)
    val first = it.next()
    assert(first.warcHeader("WARC-Record-ID").contains("<urn:uuid:r0>"))
    assert(first.payload.length == 10000)
    // total stream is ~1 GB equivalent; parser must have pulled only a
    // couple of records' worth (record + lookahead + 64 KiB buffer)
    assert(gen.served < 3L * gen.recordSize + (1 << 17),
      s"parser pulled ${gen.served} bytes for the first record — not streaming")
    var n = 1
    while (it.hasNext && n < 500) { it.next(); n += 1 } // spot-consume further
    assert(n == 500)
  }

  test("strictHeaders rejects malformed version lines; tolerant mode parses on") {
    val good = "WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    val bad = "GARBAGE-LINE\r\nWARC-Type: resource\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    val okRecs = WarcStreaming.parseStream(
      new ByteArrayInputStream(good.getBytes), "g.warc", isGzip = false,
      strictHeaders = true).toVector
    assert(okRecs.size == 1)
    val ex = intercept[IllegalArgumentException] {
      WarcStreaming.parseStream(new ByteArrayInputStream(bad.getBytes), "b.warc",
        isGzip = false, strictHeaders = true).toVector
    }
    assert(ex.getMessage.contains("strictHeaders"))
    // tolerant (reference behavior — its own strictHeaders option is a
    // no-op, warcparser.ts:13-16): the garbage line becomes the statusline
    val tolerant = WarcStreaming.parseStream(new ByteArrayInputStream(bad.getBytes),
      "b.warc", isGzip = false).toVector
    assert(tolerant.size == 1 && tolerant.head.warcVersion == "GARBAGE-LINE")
  }

  test("syncToMemberStart: finds exact member boundaries, rejects false magic") {
    // 20 one-member records, with payloads containing fake gzip magic
    val recs = (0 until 20).map { i =>
      val payload = (s"fakemagic-$i-" + "y" * 200).getBytes(StandardCharsets.ISO_8859_1)
      val r = WarcWriter.create(url = s"https://ex.org/$i", date = "2020-01-01T00:00:00Z",
        warcType = "resource", payload = payload,
        recordId = f"00000000-0000-0000-0000-$i%012d")
      WarcWriter.serialize(r, WarcWriter.CdxDigest, gzip = true)
    }
    val file = recs.reduce(_ ++ _)
    val trueStarts = recs.scanLeft(0L)(_ + _.length).dropRight(1)
    def openAt(off: Long): InputStream =
      new ByteArrayInputStream(file, off.toInt, file.length - off.toInt)
    // from 0: first member
    assert(WarcStreaming.syncToMemberStart(openAt, 0, file.length) == 0L)
    // from 1 byte in: next true member start, not a payload fake-magic
    val s1 = WarcStreaming.syncToMemberStart(openAt, 1, file.length)
    assert(trueStarts.contains(s1) && s1 == trueStarts(1))
    // from just before the last member
    val sLast = WarcStreaming.syncToMemberStart(openAt, trueStarts.last - 1, file.length)
    assert(sLast == trueStarts.last)
    // empty range (no member start inside)
    assert(WarcStreaming.syncToMemberStart(openAt, trueStarts.last + 1, file.length) == -1L)

    // FALSE magic: plant a raw 1f 8b 08 triple inside junk before a real
    // member — the validator must reject it (bad inflate / no WARC/) and
    // sync to the real member start
    val junk = Array.fill[Byte](64)('A'.toByte)
    junk(10) = 0x1f; junk(11) = 0x8b.toByte; junk(12) = 0x08
    val file2 = junk ++ recs.head
    def openAt2(off: Long): InputStream =
      new ByteArrayInputStream(file2, off.toInt, file2.length - off.toInt)
    assert(WarcStreaming.syncToMemberStart(openAt2, 0, file2.length) == 64L)
  }
}
