package graft.sources

import java.io.{ByteArrayInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import graft.SparkSpec

class WarcSourceSpec extends SparkSpec {

  /** Build a spec-conforming WARC byte stream. */
  private def warcBytes(records: Seq[(String, String, String)]): Array[Byte] = {
    val sb = new StringBuilder
    records.foreach { case (wtype, uri, payload) =>
      sb.append("WARC/1.0\r\n")
      sb.append(s"WARC-Type: $wtype\r\n")
      if (uri.nonEmpty) sb.append(s"WARC-Target-URI: $uri\r\n")
      sb.append("WARC-Date: 2024-01-01T00:00:00Z\r\n")
      sb.append(s"Content-Length: ${payload.getBytes(ISO_8859_1).length}\r\n")
      sb.append("\r\n")
      sb.append(payload)
      sb.append("\r\n\r\n")
    }
    sb.toString.getBytes(ISO_8859_1)
  }

  private val tricky = Seq(
    ("warcinfo", "", "software: graft-test"),
    // payload CONTAINS the record magic — only Content-Length parsing survives
    ("response", "https://a.org/x",
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>WARC/1.0 is mentioned here\r\nWARC-Type: fake\r\n</html>"),
    ("request", "https://a.org/x", "GET /x HTTP/1.1"),
    ("response", "https://b.org/y", "HTTP/1.1 200 OK\r\n\r\nplain body"))

  test("record boundaries honor Content-Length even when payloads embed the magic") {
    val got = WarcSource.parseStream("mem", new ByteArrayInputStream(warcBytes(tricky)),
      maxPayloadBytes = 1 << 20).toSeq
    assert(got.map(_.warc_type) == Seq("warcinfo", "response", "request", "response"))
    assert(got(1).target_uri.contains("https://a.org/x"))
    assert(new String(got(1).payload, ISO_8859_1).contains("WARC/1.0 is mentioned here"))
    assert(got.forall(r => r.content_length == r.payload.length && !r.truncated))
  }

  test("httpBody strips the response head; non-http payloads pass through") {
    val got = WarcSource.parseStream("mem", new ByteArrayInputStream(warcBytes(tricky)),
      maxPayloadBytes = 1 << 20).toSeq
    assert(new String(WarcSource.httpBody(got(1).payload), ISO_8859_1)
      .startsWith("<html>"))
    assert(new String(WarcSource.httpBody(got(0).payload), ISO_8859_1) ==
      "software: graft-test")
  }

  test("oversize records are skipped but the stream stays aligned") {
    val recs = Seq(
      ("response", "https://big.org/", "X" * 1000),
      ("response", "https://after.org/", "small"))
    val got = WarcSource.parseStream("mem", new ByteArrayInputStream(warcBytes(recs)),
      maxPayloadBytes = 100).toSeq
    assert(got.size == 2)
    assert(got(0).truncated && got(0).payload.isEmpty && got(0).content_length == 1000)
    assert(!got(1).truncated &&
      new String(got(1).payload, ISO_8859_1) == "small")
  }

  test("readWarc parallelizes across plain and gzip files with per-file indices") {
    val dir = Files.createTempDirectory("warc")
    val f1 = dir.resolve("a.warc").toFile
    val o1 = new FileOutputStream(f1)
    o1.write(warcBytes(tricky)); o1.close()
    val f2 = dir.resolve("b.warc.gz").toFile
    val o2 = new GZIPOutputStream(new FileOutputStream(f2))
    o2.write(warcBytes(Seq(("response", "https://gz.org/", "HTTP/1.1 200 OK\r\n\r\ngzipped body"))))
    o2.close()
    val df = WarcSource.readWarc(spark, dir.toString + "/*")
    val rows = df.collect()
    assert(rows.length == tricky.size + 1)
    val byFile = rows.groupBy(_.getString(0).split('/').last)
    assert(byFile("a.warc").map(_.getLong(1)).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    assert(byFile("b.warc.gz").head.getString(3) == "https://gz.org/")
    // payload survives the DataFrame round-trip byte-for-byte
    val gz = byFile("b.warc.gz").head.getAs[Array[Byte]]("payload")
    assert(new String(WarcSource.httpBody(gz), ISO_8859_1) == "gzipped body")
  }
}
