package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{RemoteMetrics, RemoteRequester}

/** Remote-response parsing: synthesized document following the response
  * schema (FIXTURES.md §2); expected values re-derived from the mapping
  * semantics (`response.py:22-35,51-64`), not copied from reference tests. */
class RemoteMetricsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val doc =
    """{
      |  "analysisResults": [{
      |    "table": {
      |      "name": "db1.tbl1",
      |      "totalSizeBytes": 1000000, "targetSizeBytes": 800000,
      |      "currentScanOverheadMillis": 5000, "targetScanOverheadMillis": 100,
      |      "totalFilesCount": 40, "targetFilesCount": 4,
      |      "totalPartitionsCount": 7,
      |      "totalDataFileCount": 25, "totalDataFileSizeBytes": 500000
      |    },
      |    "largestPartition": { "name": "p9", "totalSizeBytes": 300000, "targetSizeBytes": 250000,
      |      "currentScanOverheadMillis": 900, "targetScanOverheadMillis": 40,
      |      "totalFilesCount": 12, "targetFilesCount": 2 },
      |    "worstOverheadPartition": { "name": "p3", "totalSizeBytes": 200000, "targetSizeBytes": 150000,
      |      "currentScanOverheadMillis": 2000, "targetScanOverheadMillis": 50,
      |      "totalFilesCount": 9, "targetFilesCount": 1 },
      |    "worstFilesCountPartition": { "name": "p5", "totalSizeBytes": 100000, "targetSizeBytes": 90000,
      |      "currentScanOverheadMillis": 700, "targetScanOverheadMillis": 30,
      |      "totalFilesCount": 20, "targetFilesCount": 2 },
      |    "worstAvgFileSizePartition": { "name": "p7", "totalSizeBytes": 60000, "targetSizeBytes": 50000,
      |      "currentScanOverheadMillis": 300, "targetScanOverheadMillis": 20,
      |      "totalFilesCount": 10, "targetFilesCount": 5,
      |      "totalDataFileCount": 8, "totalDataFileSizeBytes": 40000 }
      |  }],
      |  "errors": [
      |    {"table": "db1.gone", "error": "table not found"},
      |    {"table": "", "error": "ignored - empty table"}
      |  ]
      |}""".stripMargin

  test("parse yields all 9 metrics with derived averages") {
    import spark.implicits._
    val (rows, errors) = RemoteMetrics.parse(spark.createDataset(Seq(doc)))
    val m = rows.collect().map(r => r.metric -> r).toMap
    assert(m.size == 9)
    assert(m("FULL_SCAN_OVERHEAD").before == 5000.0 && m("FULL_SCAN_OVERHEAD").after.contains(100.0))
    assert(m("WORST_SCAN_OVERHEAD").before == 2000.0 && m("WORST_SCAN_OVERHEAD").after.contains(50.0))
    assert(m("FILE_COUNT").before == 40.0 && m("FILE_COUNT").after.contains(4.0))
    assert(m("WORST_FILE_COUNT").before == 20.0 && m("WORST_FILE_COUNT").after.contains(2.0))
    // avg: dataSize/dataCount before, targetSize/targetCount after
    assert(m("AVG_FILE_SIZE").before == 500000.0 / 25)
    assert(m("AVG_FILE_SIZE").after.contains(800000.0 / 4))
    assert(m("WORST_AVG_FILE_SIZE").before == 40000.0 / 8)
    assert(m("WORST_AVG_FILE_SIZE").after.contains(50000.0 / 5))
    assert(m("TOTAL_TABLE_SIZE").before == 1000000.0 && m("TOTAL_TABLE_SIZE").after.contains(800000.0))
    assert(m("LARGEST_PARTITION_SIZE").before == 300000.0)
    assert(m("TOTAL_PARTITIONS").before == 7.0 && m("TOTAL_PARTITIONS").after.isEmpty)
    // table identity and ordering
    assert(rows.collect().forall(_.table == "db1.tbl1"))
    assert(rows.orderBy("ordinal").collect().map(_.ordinal).toSeq == (0 to 8))
    // errors: empty-table entry dropped
    val errs = errors.collect()
    assert(errs.toSeq == Seq(("db1.gone", "table not found")))
  }

  test("malformed document routes to the error channel, not silence") {
    import spark.implicits._
    val (rows, errors) = RemoteMetrics.parse(
      spark.createDataset(Seq("{not json at all", doc)))
    assert(rows.count() == 9) // the good doc still parses
    val errs = errors.collect()
    assert(errs.exists(_._2.startsWith("malformed response document")))
  }

  test("zero counts guard division") {
    import spark.implicits._
    val zeroDoc = doc
      .replace("\"totalDataFileCount\": 25", "\"totalDataFileCount\": 0")
    val (rows, _) = RemoteMetrics.parse(spark.createDataset(Seq(zeroDoc)))
    val m = rows.collect().map(r => r.metric -> r).toMap
    assert(m("AVG_FILE_SIZE").before == 0.0)
  }

  // ---- S7 transport: the POST/response loop against a LOOPBACK fixture
  // server (requester.py:29-36) — no external endpoint, no credentials

  private def withServer(status: Int, body: String)(
      run: (String, () => (String, String, String)) => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var seen = ("", "", "") // (method, content-type, body)
    server.createContext("/analyze", { exchange =>
      seen = (exchange.getRequestMethod,
        exchange.getRequestHeaders.getFirst("Content-Type"),
        new String(exchange.getRequestBody.readAllBytes(), "UTF-8"))
      val resp = body.getBytes("UTF-8")
      exchange.getResponseHeaders.add("Content-Type", "application/json")
      exchange.sendResponseHeaders(status, resp.length)
      exchange.getResponseBody.write(resp)
      exchange.close()
    })
    server.start()
    try run(s"http://127.0.0.1:${server.getAddress.getPort}/analyze", () => seen)
    finally server.stop(0)
  }

  test("loopback transport: POST carries ONLY the table list, parse round-trips") {
    withServer(200, doc) { (url, seen) =>
      val (rows, errors) = RemoteRequester.requestMetrics(
        spark, url, Seq("db1.tbl1", "db1.gone"))
      // full 9-metric extraction arrived through the real HTTP loop
      val m = rows.collect().map(r => r.metric -> r).toMap
      assert(m.size == 9 && m("FILE_COUNT").before == 40.0)
      // failed-table extension (response.py:43-48): named error kept,
      // empty-table error dropped
      assert(errors.collect().toSeq == Seq(("db1.gone", "table not found")))
      val (method, ct, body) = seen()
      assert(method == "POST" && ct == "application/json")
      assert(body == """{"tables":["db1.tbl1","db1.gone"]}""")
      // the reference posts accessKey/secretKey/tokenSession/region
      // (manager.py:127-138); our payload must never contain them
      for (k <- Seq("accessKey", "secretKey", "tokenSession", "region"))
        assert(!body.contains(k), s"credential field $k leaked into the payload")
    }
  }

  test("non-2xx response: every requested table lands on the error channel") {
    withServer(500, """{"oops": true}""") { (url, _) =>
      val (rows, errors) = RemoteRequester.requestMetrics(
        spark, url, Seq("db1.a", "db1.b"))
      assert(rows.count() == 0)
      assert(errors.collect().toSeq.sorted == Seq(
        ("db1.a", "request failed: HTTP 500"),
        ("db1.b", "request failed: HTTP 500")))
    }
  }

  test("dead endpoint: connect failure reports instead of raising") {
    // port 1 on loopback: nothing listens there
    val (rows, errors) = RemoteRequester.requestMetrics(
      spark, "http://127.0.0.1:1/analyze", Seq("db1.x"), timeoutMs = 2000L)
    assert(rows.count() == 0)
    val errs = errors.collect()
    assert(errs.length == 1 && errs.head._1 == "db1.x"
      && errs.head._2.startsWith("request failed:"))
  }
}
