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

  test("non-pushable predicates are still applied by Spark above the scan") {
    val df = read("laps").filter(col("lap_number") > 10)
    assert(df.count() === F1Tables.laps(spark).filter(col("lap_number") > 10).count())
  }

  test("sessions entity reads as a single partition") {
    val df = read("sessions")
    assert(scanOf(df).inputRDD.getNumPartitions === 1)
    assert(df.count() === 1)
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
