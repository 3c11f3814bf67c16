package graft

import graft.io.{Http, MiniHttp}

/** Real HTTP range/retry semantics against a loopback server: per-chunk
  * Range GETs, 503 retry with backoff, mid-body truncation resume at the
  * failed offset, redirect following, and cross-chunk line assembly.
  */
class HttpSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def body(lines: Int): Array[Byte] =
    (0 until lines).map(i => s"line-$i-${"x" * (i % 13)}").mkString("", "\n", "\n")
      .getBytes("UTF-8")

  test("chunked range reads reassemble the exact body across many chunks") {
    val srv = new MiniHttp
    try {
      val content = body(500)
      srv.serve("/data", content)
      val got = Http.chunkIterator(srv.url("/data"), chunkSize = 1024,
        maxRetries = 0, backoffMs = 1).reduce(_ ++ _)
      assert(got.sameElements(content))
      assert(srv.requests("/data") > 3, "expected several range requests")
    } finally srv.stop()
  }

  test("503 bursts are retried with backoff; permanent errors are not") {
    val srv = new MiniHttp
    try {
      srv.serve("/flaky", body(50), failFirst = 2)
      val got = Http.chunkIterator(srv.url("/flaky"), chunkSize = 1 << 20,
        maxRetries = 3, backoffMs = 1).reduce(_ ++ _)
      assert(got.sameElements(body(50)))
      assert(srv.requests("/flaky") >= 3) // 2 failures + success
      // 404 is permanent: no retry loop, loud failure
      val e = intercept[IllegalStateException] {
        Http.fetchRange(srv.url("/missing"), 0, 100, maxRetries = 3, backoffMs = 1)
      }
      assert(e.getMessage.contains("404"))
    } finally srv.stop()
  }

  test("mid-body truncation resumes at the failed chunk's offset") {
    val srv = new MiniHttp
    try {
      val content = body(400)
      // 3rd request (a mid-stream chunk) sends half its range then drops
      srv.serve("/trunc", content, truncateNth = 3)
      val got = Http.chunkIterator(srv.url("/trunc"), chunkSize = 1000,
        maxRetries = 2, backoffMs = 1).reduce(_ ++ _)
      assert(got.sameElements(content), "resumed stream must be byte-exact")
      // the failed chunk was re-pulled: more requests than ceil(len/chunk)
      val minReqs = (content.length + 999) / 1000
      assert(srv.requests("/trunc") == minReqs + 1)
    } finally srv.stop()
  }

  test("redirects are followed (relative Location)") {
    val srv = new MiniHttp
    try {
      srv.serve("/real", body(20))
      srv.redirect("/alias", "/real")
      val got = Http.chunkIterator(srv.url("/alias"), chunkSize = 1 << 20,
        maxRetries = 0, backoffMs = 1).reduce(_ ++ _)
      assert(got.sameElements(body(20)))
    } finally srv.stop()
  }

  test("lines spanning chunk boundaries assemble exactly once (distributed read)") {
    val srv = new MiniHttp
    try {
      val lines = (0 until 300).map(i => s"rec-$i-${"y" * (i % 29)}")
      val content = lines.mkString("", "\n", "\n").getBytes("UTF-8")
      srv.serve("/a", content, failFirst = 1)
      srv.serve("/b", content)
      // chunk size chosen to split MOST lines across chunk edges
      val got = Http.readLinesRanged(spark, Seq(srv.url("/a"), srv.url("/b")),
          chunkSize = 37, maxRetries = 3, backoffMs = 1)
        .as[String].collect()
      assert(got.length == 600)
      assert(got.sorted.toSeq == (lines ++ lines).sorted)
    } finally srv.stop()
  }

  test("replica failover resumes at the same offset on the next replica") {
    val srv = new MiniHttp
    try {
      val content = body(400)
      // replica A: request #4 truncates mid-body and A keeps failing after
      // (failFirst kicks in only for the FIRST requests, so instead serve
      // a second path that truncates the 4th request; the client's
      // maxRetries=0 makes that chunk fail over immediately)
      srv.serve("/repA", content, truncateNth = 4)
      srv.serve("/repB", content)
      val got = Http.chunkIteratorReplicated(
        Seq(srv.url("/repA"), srv.url("/repB")),
        chunkSize = 1000, maxRetries = 0, backoffMs = 1).reduce(_ ++ _)
      assert(got.sameElements(content), "failover stream must be byte-exact")
      assert(srv.requests("/repA") >= 4, "A served the stream head")
      assert(srv.requests("/repB") >= 1, "B picked up at the failed offset")
      // a replica that 404s entirely fails over immediately
      val got2 = Http.chunkIteratorReplicated(
        Seq(srv.url("/gone"), srv.url("/repB")),
        chunkSize = 1000, maxRetries = 0, backoffMs = 1).reduce(_ ++ _)
      assert(got2.sameElements(content))
      // every replica failing the same chunk is a loud task failure
      val e = intercept[java.io.IOException] {
        Http.chunkIteratorReplicated(Seq(srv.url("/gone"), srv.url("/gone2")),
          chunkSize = 1000, maxRetries = 0, backoffMs = 1).reduce(_ ++ _)
      }
      assert(e.getMessage.contains("all 2 replicas failed"))
    } finally srv.stop()
  }

  test("a 206 without Content-Range is a loud protocol error, not silent data loss") {
    val srv = new MiniHttp
    try {
      val raw = body(5)
      srv.serve("/ok", raw)
      val (b, t, ranged) = Http.fetchRange(srv.url("/ok"), 0, 10, 0, 1)
      assert(ranged && t == raw.length && b.length == 11)
      // same content, but the server strips Content-Range from its 206:
      // the client cannot learn the total → must fail, never guess
      srv.serve("/broken", raw, stripContentRange = true)
      val e = intercept[java.io.IOException] {
        Http.fetchRange(srv.url("/broken"), 0, 10, maxRetries = 0, backoffMs = 1)
      }
      assert(e.getMessage.contains("without Content-Range"))
    } finally srv.stop()
  }

  test("no trailing newline: the final partial line still emits") {
    val srv = new MiniHttp
    try {
      srv.serve("/nonl", "a\nb\nlast-no-nl".getBytes("UTF-8"))
      val got = Http.lineIterator(Http.chunkIterator(srv.url("/nonl"),
        chunkSize = 4, maxRetries = 0, backoffMs = 1)).toSeq
      assert(got == Seq("a", "b", "last-no-nl"))
    } finally srv.stop()
  }
}
