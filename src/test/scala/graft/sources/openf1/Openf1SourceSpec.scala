package graft.sources.openf1

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.F1Tables

/** The openf1 DataSourceV2: results identical to the committed
  * fixture parquet, equality predicates pushed into the source,
  * per-driver parallel partitions, and the 429-retry wrapper
  * surviving a flaky transport.
  */
class Openf1SourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def read(entity: String, flaky: Boolean = false) =
    spark.read.format("openf1")
      .option("entity", entity).option("flaky", flaky.toString).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get

  test("laps via the connector equal the committed fixture parquet") {
    val viaApi = read("laps")
    val viaFiles = F1Tables.laps(spark)
    assert(viaApi.exceptAll(viaFiles).isEmpty && viaFiles.exceptAll(viaApi).isEmpty)
  }

  test("stints and drivers round-trip too") {
    for (e <- Seq("stints", "drivers")) {
      val viaApi = read(e)
      val viaFiles = e match {
        case "stints"  => F1Tables.stints(spark)
        case "drivers" => F1Tables.drivers(spark)
      }
      assert(viaApi.exceptAll(viaFiles).isEmpty && viaFiles.exceptAll(viaApi).isEmpty)
    }
  }

  test("driver_number equality pushes into the source: one partition, pruned fetch") {
    val df = read("laps").filter(col("session_key") === 9001 && col("driver_number") === 7)
    val scan = scanOf(df)
    assert(scan.scan.description().contains("driver_number=Some(7)"))
    assert(scan.scan.description().contains("session_key=Some(9001)"))
    assert(scan.inputRDD.getNumPartitions === 1)
    assert(df.count() === F1Tables.laps(spark).filter(col("driver_number") === 7).count())
  }

  test("unfiltered scan plans one partition per driver (parallel, not N+1 serial)") {
    assert(scanOf(read("laps")).inputRDD.getNumPartitions === 20)
  }

  test("column pruning reaches the source: a 2-column select reads a 2-column schema") {
    val df = read("laps").select("lap_number", "lap_duration")
    val scan = scanOf(df).scan
    assert(scan.readSchema().fieldNames.toSet === Set("lap_number", "lap_duration"),
      s"required columns must prune the scan schema: ${scan.readSchema()}")
    // values survive the projection (order preserved from the source schema)
    val viaFiles = F1Tables.laps(spark).select("lap_number", "lap_duration")
    assert(df.exceptAll(viaFiles).isEmpty && viaFiles.exceptAll(df).isEmpty)
  }

  test("LIMIT pushes into the source as a per-partition cap; global limit stays exact") {
    val df = read("laps").limit(3)
    val scan = scanOf(df).scan
    assert(scan.description().contains("limit=3"),
      s"limit must reach the scan: ${scan.description()}")
    assert(df.count() === 3) // partial push: Spark's global limit still applies
    // an un-limited read keeps limit=-1 (no cap leaks between scans)
    assert(scanOf(read("laps")).scan.description().contains("limit=-1"))
  }

  test("non-pushable predicates are still applied by Spark above the scan") {
    val df = read("laps").filter(col("lap_number") > 10)
    assert(df.count() === F1Tables.laps(spark).filter(col("lap_number") > 10).count())
  }

  test("sessions entity reads as a single partition") {
    val df = read("sessions")
    assert(scanOf(df).inputRDD.getNumPartitions === 1)
    assert(df.count() === graft.f1.FixtureGen.sessions.length)
  }

  test("retry wrapper survives a flaky (429) transport and serves full data") {
    Openf1Api.retriesServed.set(0)
    val viaFlaky = read("stints", flaky = true)
    val viaFiles = F1Tables.stints(spark)
    assert(viaFlaky.exceptAll(viaFiles).isEmpty && viaFiles.exceptAll(viaFlaky).isEmpty)
    assert(Openf1Api.retriesServed.get() > 0, "the flaky transport must have 429'd")
  }

  test("flaky state is per scan: a SECOND flaky read still exercises the retry path") {
    read("drivers", flaky = true).count()
    val before = Openf1Api.retriesServed.get()
    read("drivers", flaky = true).count()
    assert(Openf1Api.retriesServed.get() > before,
      "each scan gets its own FlakyTransport, so each must serve fresh 429s")
  }

  // ---------------------------------------------------------------
  // Real HTTP path: an in-process HTTP server serves the fixture
  // entities as openf1-style JSON (the container has no egress), and
  // HttpTransport — the one-class swap the seam promises — is driven
  // through the same contract, including genuine 429 responses.
  // ---------------------------------------------------------------

  /** Renders FixtureGen rows as the JSON arrays the API would return.
    * `lapCutoffMs` simulates a LIVE session: only laps with
    * date_start at or below the cutoff exist yet. */
  private def fixtureJson(entity: String, sk: Option[Long], dn: Option[Long],
                          lapCutoffMs: Long = Long.MaxValue): String = {
    def num(o: Option[Double]) = o.map(_.toString).getOrElse("null")
    def ts(t: java.sql.Timestamp) =
      "\"" + java.time.Instant.ofEpochSecond(t.getTime / 1000, t.getNanos).toString + "\""
    def keep(s: Long, d: Long) = sk.forall(_ == s) && dn.forall(_ == d)
    val items = entity match {
      case "laps" => graft.f1.FixtureGen.laps.collect {
        case (s, d, lap, start, s1, s2, s3, dur, pit)
            if keep(s, d) && start.getTime <= lapCutoffMs =>
          s"""{"session_key":$s,"driver_number":$d,"lap_number":$lap,
             |"date_start":${ts(start)},"duration_sector_1":${num(s1)},
             |"duration_sector_2":${num(s2)},"duration_sector_3":${num(s3)},
             |"lap_duration":${num(dur)},"is_pit_out_lap":$pit}""".stripMargin
      }
      case "stints" => graft.f1.FixtureGen.stints.collect {
        case (s, d, st, lo, hi, c, age) if keep(s, d) =>
          s"""{"session_key":$s,"driver_number":$d,"stint_number":$st,
             |"lap_start":$lo,"lap_end":$hi,"compound":"$c",
             |"tyre_age_at_start":$age}""".stripMargin
      }
      case "drivers" => graft.f1.FixtureGen.drivers.collect {
        case (s, d, acr, team, color) if keep(s, d) =>
          s"""{"session_key":$s,"driver_number":$d,"name_acronym":"$acr",
             |"team_colour":"$team","driver_color":"$color"}""".stripMargin
      }
      case "sessions" => graft.f1.FixtureGen.sessions.collect {
        case (s, mk, name, tpe, circuit, start, end) if sk.forall(_ == s) =>
          s"""{"session_key":$s,"meeting_key":$mk,"session_name":"$name",
             |"session_type":"$tpe","circuit_short_name":"$circuit",
             |"date_start":${ts(start)},"date_end":${ts(end)}}""".stripMargin
      }
    }
    items.mkString("[", ",", "]")
  }

  /** In-process server; flaky=true serves one 429 per distinct URI
    * before succeeding — real rate-limit responses over real HTTP.
    * `lapCutoffMs` (mutable) drives the live-session stream test:
    * raising it between polls makes new laps "arrive". */
  private def withServer[T](flaky: Boolean,
      lapCutoffMs: java.util.concurrent.atomic.AtomicLong =
        new java.util.concurrent.atomic.AtomicLong(Long.MaxValue))
      (body: String => T): T = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      if (flaky && seen.add(ex.getRequestURI.toString)) {
        ex.sendResponseHeaders(429, -1)
        ex.close()
      } else {
        val q = Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
          .filter(_.contains("=")).map { kv =>
            val Array(k, v) = kv.split("=", 2); k -> v
          }.toMap
        val bytes = fixtureJson(ex.getRequestURI.getPath.stripPrefix("/"),
          q.get("session_key").map(_.toLong),
          q.get("driver_number").map(_.toLong),
          lapCutoffMs.get()).getBytes("UTF-8")
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("HttpTransport decodes every entity identically to the fixture transport") {
    withServer(flaky = false) { base =>
      val http = new HttpTransport(base)
      for ((entity, driver) <- Seq(("laps", 7L), ("stints", 7L),
                                   ("drivers", 14L), ("sessions", -1L))) {
        assert(http.get(entity, Some(9001L), driver)
          === FixtureTransport.get(entity, Some(9001L), driver),
          s"entity=$entity")
      }
    }
  }

  test("full DSv2 read over real HTTP equals the committed fixture parquet") {
    withServer(flaky = false) { base =>
      val viaHttp = spark.read.format("openf1")
        .option("entity", "laps").option("url", base).load()
      val viaFiles = F1Tables.laps(spark)
      assert(viaHttp.exceptAll(viaFiles).isEmpty
        && viaFiles.exceptAll(viaHttp).isEmpty)
    }
  }

  test("pushdown still prunes the HTTP fetch to one partition") {
    withServer(flaky = false) { base =>
      val df = spark.read.format("openf1")
        .option("entity", "laps").option("url", base).load()
        .filter(col("session_key") === 9001 && col("driver_number") === 7)
      assert(scanOf(df).inputRDD.getNumPartitions === 1)
      assert(df.count()
        === F1Tables.laps(spark).filter(col("driver_number") === 7).count())
    }
  }

  test("genuine HTTP 429 responses are retried to a full result") {
    withServer(flaky = true) { base =>
      val viaHttp = spark.read.format("openf1")
        .option("entity", "stints").option("url", base).load()
      val viaFiles = F1Tables.stints(spark)
      assert(viaHttp.exceptAll(viaFiles).isEmpty
        && viaFiles.exceptAll(viaHttp).isEmpty)
    }
  }

  test("GLOBAL 429s (whole-client throttle) recover through the shared limiter") {
    // the server throttles the CLIENT, not a URI: every request in
    // the first burst gets 429 regardless of path — the scenario
    // where uncoordinated per-partition retries re-fire in lockstep.
    // The shared limiter must open ONE penalty window (429s during
    // the burst join it) and the scan must still produce full data.
    // 4 < withRetry's 5 attempts: the single-threaded planning fetch
    // absorbs the whole burst without exhausting its retry budget.
    val global429s = new java.util.concurrent.atomic.AtomicInteger(4)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      if (global429s.getAndDecrement() > 0) {
        ex.sendResponseHeaders(429, -1)
        ex.close()
      } else {
        val q = Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
          .filter(_.contains("=")).map { kv =>
            val Array(k, v) = kv.split("=", 2); k -> v
          }.toMap
        val bytes = fixtureJson(ex.getRequestURI.getPath.stripPrefix("/"),
          q.get("session_key").map(_.toLong),
          q.get("driver_number").map(_.toLong)).getBytes("UTF-8")
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val penaltiesBefore = Openf1Api.limiter.penaltiesOpened
      val viaHttp = spark.read.format("openf1")
        .option("entity", "stints").option("url", base).load()
      val viaFiles = F1Tables.stints(spark)
      assert(viaHttp.exceptAll(viaFiles).isEmpty
        && viaFiles.exceptAll(viaHttp).isEmpty)
      val opened = Openf1Api.limiter.penaltiesOpened - penaltiesBefore
      assert(opened >= 1L, "the global throttle must open a penalty window")
      // the serial planning fetch re-trips the limit once per retry,
      // and each post-window 429 escalates (50→100→200→400ms): at
      // most one window per 429 served, never a storm of re-fires
      assert(opened <= 4L, s"opened $opened windows for 4 global 429s")
      assert(Openf1Api.limiter.currentPenaltyMs >= 50L,
        "escalated penalty must be recorded")
    } finally server.stop(0)
  }

  // ---------------------------------------------------------------
  // Streaming (MicroBatchStream): the live-session polling analogue
  // of the reference dashboard's re-query loop (dashboard.py:89-99).
  // ---------------------------------------------------------------

  private def runStream(url: Option[String], name: String)
      (drive: org.apache.spark.sql.streaming.StreamingQuery => Unit)
      : org.apache.spark.sql.DataFrame = {
    val reader = spark.readStream.format("openf1").option("entity", "laps")
    val q = url.fold(reader)(u => reader.option("url", u)).load()
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try drive(q) finally q.stop()
    val out = spark.table(name)
    val rows = out.collectAsList()
    spark.catalog.dropTempView(name)
    spark.createDataFrame(rows, out.schema)
  }

  test("readStream over the connector converges to the batch scan (static feed = one batch)") {
    val got = runStream(None, "openf1_stream_static")(_.processAllAvailable())
    val want = F1Tables.laps(spark)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("live stream: laps arriving between polls come through incrementally, exactly once") {
    val allDates = graft.f1.FixtureGen.laps.map(_._4.getTime).sorted
    val mid = allDates(allDates.length / 2)
    val cutoff = new java.util.concurrent.atomic.AtomicLong(mid)
    withServer(flaky = false, cutoff) { base =>
      var phase1 = 0L
      val got = runStream(Some(base), "openf1_stream_live") { q =>
        q.processAllAvailable() // batch(es) over the pre-cutoff laps
        phase1 = spark.table("openf1_stream_live").count()
        cutoff.set(Long.MaxValue) // the rest of the session "happens"
        q.processAllAvailable() // next poll sees a larger max offset
      }
      val want = F1Tables.laps(spark)
      assert(phase1 > 0 && phase1 < want.count(),
        s"first poll must see a strict prefix, got $phase1")
      // exactly once: full parity in both directions (a duplicate or
      // a dropped lap fails one of the excepts)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    }
  }

  test("a custom transport drops in at the seam; retry policy stays in the caller") {
    // stand-in for a real HTTP client: 429s twice, then delegates
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val custom = new Openf1Transport {
      override def get(entity: String, sessionKey: Option[Long],
                       driver: Long): Seq[org.apache.spark.sql.catalyst.InternalRow] = {
        if (calls.incrementAndGet() <= 2) throw new Openf1Api.RateLimitedException
        FixtureTransport.get(entity, sessionKey, driver)
      }
    }
    val rows = Openf1Api.fetch(custom, "drivers", Some(9001L), 7L)
    assert(calls.get() === 3, "two 429s then success")
    assert(rows.nonEmpty)
    assert(rows === FixtureTransport.get("drivers", Some(9001L), 7L))
  }
}
