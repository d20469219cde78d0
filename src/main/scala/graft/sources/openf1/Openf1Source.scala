package graft.sources.openf1

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.f1.{F1Schemas, FixtureGen}

/** `spark.read.format("openf1")` — a DataSourceV2 connector shaped
  * like the reference's OpenF1 REST ingestion (S1–S3, S9, S10):
  *
  * - one InputPartition per (session, driver) — the unit the API
  *   paginates by and the reference fetches serially in an N+1 loop
  *   (/root/reference/src/session_object.py:137-154); here the
  *   partitions read in PARALLEL across executors;
  * - `session_key` / `driver_number` equality predicates push into
  *   the source exactly like the API's query parameters
  *   (/root/reference/src/data_processing.py:36);
  * - each partition fetch goes through the 429 retry/backoff wrapper
  *   (/root/reference/src/helper_functions.py:7-31).
  *
  * The transport is the deterministic in-memory fixture "API"
  * (Openf1Api) — the container has no egress — so the connector's
  * planning, pushdown, partitioning, and retry machinery are all real
  * and tested while the HTTP layer is a stub with the same contract.
  */
class Openf1Source extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "openf1"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Openf1Api.schemaFor(Option(options.get("entity")).getOrElse("laps"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new Openf1Table(
      Option(properties.get("entity")).getOrElse("laps"),
      properties.getOrDefault("flaky", "false").toBoolean,
      Option(properties.get("url")),
      Option(properties.get("session_key")).map(_.toLong),
      Option(properties.get("driver_number")).map(_.toLong))
}

private[openf1] class Openf1Table(entity: String, flaky: Boolean,
                                  url: Option[String],
                                  optSessionKey: Option[Long] = None,
                                  optDriverNumber: Option[Long] = None)
    extends Table with SupportsRead {
  override def name(): String = s"openf1.$entity"
  override def schema(): StructType = Openf1Api.schemaFor(entity)
  override def capabilities(): util.Set[TableCapability] =
    // entities with a primary key also stream (live polling)
    (if (Openf1MicroBatch.streamKey(entity).isDefined)
       Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
     else Set(TableCapability.BATCH_READ)).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new Openf1ScanBuilder(entity, flaky, url, optSessionKey, optDriverNumber)
}

private[openf1] class Openf1ScanBuilder(entity: String, flaky: Boolean,
                                        url: Option[String],
                                        optSessionKey: Option[Long],
                                        optDriverNumber: Option[Long])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  // reader options seed the scope; pushed filters narrow it further.
  // Streaming scans get NO filter pushdown from the planner, so the
  // options are how a live poll is scoped to one session/driver.
  private var sessionKey: Option[Long] = optSessionKey
  private var driverNumber: Option[Long] = optDriverNumber
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = Openf1Api.schemaFor(entity)
  private var limit: Option[Int] = None

  // LIMIT pushdown: the REST contract has no row-limit parameter (same
  // story as field selection), so the cap applies per PARTITION at the
  // reader — rows past it are never projected or handed to Spark.
  // Partial push (the default): Spark keeps its own global limit on
  // top, which is what makes a per-partition cap correct.
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  // §2.1 column pruning INTO the source: a SELECT of two columns must
  // not deserialize nine — the API fetch still returns full pages (the
  // REST contract has no field selection), but rows are projected at
  // the reader before they ever enter Spark, which is where the
  // per-row width cost lives at scale.
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source column ORDER (Spark may request any order; the
    // reader projects by index into the full row)
    required = StructType(Openf1Api.schemaFor(entity).fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case EqualTo("session_key", _: Number)   => true
      case EqualTo("driver_number", _: Number) => true
      case _                                   => false
    }
    ours.foreach {
      case EqualTo("session_key", v: Number)   => sessionKey = Some(v.longValue())
      case EqualTo("driver_number", v: Number) => driverNumber = Some(v.longValue())
      case _                                   =>
    }
    accepted = ours
    rest // Spark re-evaluates everything we did not accept
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan =
    new Openf1Scan(entity, sessionKey, driverNumber, flaky, url, required, limit)
}

private[openf1] class Openf1Scan(entity: String, sessionKey: Option[Long],
                                 driverNumber: Option[Long], flaky: Boolean,
                                 url: Option[String], required: StructType,
                                 limit: Option[Int] = None)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    // pushdown does not reach streaming scans in Spark's planner, so
    // sessionKey/driverNumber arrive as options only; Spark applies
    // any DataFrame filters above the source.
    new Openf1MicroBatchStream(entity, sessionKey, driverNumber, transport, required)
  override def description(): String =
    s"openf1 entity=$entity pushed=[session_key=$sessionKey, " +
      s"driver_number=$driverNumber, limit=${limit.getOrElse(-1)}] " +
      s"columns=[${required.fieldNames.mkString(",")}]"

  // one transport per SCAN: flaky-mode state is instance-scoped, so
  // every flaky read exercises the retry wrapper (a JVM-global counter
  // would serve its simulated 429 only once per process). `url` set
  // → real HTTP; absent → the in-memory fixture transport.
  private val base: Openf1Transport =
    url.map(new HttpTransport(_)).getOrElse(FixtureTransport)
  private val transport: Openf1Transport =
    if (flaky) new FlakyTransport(base) else base

  override def planInputPartitions(): Array[InputPartition] =
    if (entity == "sessions")
      // session metadata is not per-driver — one partition
      Array(Openf1Partition(entity, sessionKey, -1L))
    else {
      // driver enumeration goes through the SAME transport as the data
      // fetch (GET /drivers, no driver_number param), so pointing `url`
      // at a real endpoint plans partitions from that endpoint's own
      // driver listing — not from the local fixtures. Planning uses the
      // un-decorated transport: flaky-mode 429s are a per-(entity,
      // driver) READER contract the specs count.
      val schema = Openf1Api.schemaFor("drivers")
      val idx = schema.fieldIndex("driver_number")
      val all = Openf1Api.fetch(base, "drivers", sessionKey, -1L)
        .map(_.getLong(idx)).distinct
      driverNumber.map(d => all.filter(_ == d)).getOrElse(all)
        .map(d => Openf1Partition(entity, sessionKey, d): InputPartition)
        .toArray
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new Openf1ReaderFactory(transport, required, limit)
}

private[openf1] case class Openf1Partition(entity: String, sessionKey: Option[Long],
                                           driverNumber: Long)
    extends InputPartition

private[openf1] class Openf1ReaderFactory(transport: Openf1Transport,
                                          required: StructType,
                                          limit: Option[Int] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[Openf1Partition]
    val full = Openf1Api.schemaFor(p.entity)
    val fetched = Openf1Api.fetch(transport, p.entity, p.sessionKey, p.driverNumber)
    // project to the pruned schema at the source boundary
    val capped = limit.map(fetched.take).getOrElse(fetched)
    val rows = Openf1Api.project(capped, full, required)
    new PartitionReader[InternalRow] {
      private val it = rows.iterator
      private var current: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

/** The transport seam — the "network" boundary of the connector. A
  * real deployment implements this with an HTTP GET to
  * `https://api.openf1.org/v1/{entity}?session_key=&driver_number=`
  * plus JSON decode (the reference's live path,
  * /root/reference/src/helper_functions.py:7-31); this sandbox has no
  * egress, so [[FixtureTransport]] serves the same contract from the
  * committed fixtures. Everything above the trait — schema, pushdown,
  * partition planning, the 429 retry wrapper — is transport-agnostic:
  * swapping in a real HTTP client is one class implementing `get`. */
trait Openf1Transport extends Serializable {
  /** One logical GET for a (entity, session?, driver) page.
    * Implementations signal a 429-equivalent by throwing
    * [[Openf1Api.RateLimitedException]]; retry policy lives in the
    * caller ([[Openf1Api.fetch]]), not in transports. */
  def get(entity: String, sessionKey: Option[Long], driver: Long): Seq[InternalRow]
}

/** Deterministic in-memory transport: serves the FixtureGen entities —
  * the same data committed under fixtures/f1. */
object FixtureTransport extends Openf1Transport {
  override def get(entity: String, sessionKey: Option[Long],
                   driver: Long): Seq[InternalRow] =
    Openf1Api.rows(entity, sessionKey, driver)
}

/** Real HTTP implementation of the transport seam:
  * `GET {baseUrl}/{entity}?session_key=&driver_number=` + JSON-array
  * decode against the entity schema — the reference's live ingestion
  * path (/root/reference/src/helper_functions.py:7-31,
  * /root/reference/src/data_processing.py:61-78) as ONE class behind
  * the trait, exactly the swap the seam promises. An HTTP 429 maps to
  * [[Openf1Api.RateLimitedException]], so the caller's retry/backoff
  * policy applies to real responses as to simulated ones; any other
  * non-200 propagates (fail loud, never fabricate rows).
  * Openf1SourceSpec drives this class against an in-process HTTP
  * server serving fixture JSON — the container has no egress;
  * pointing `url` at the public `https://api.openf1.org/v1` is
  * configuration, not code. The client is @transient-lazy: rebuilt
  * per executor after task serialization, never shipped. */
final class HttpTransport(baseUrl: String) extends Openf1Transport {
  // bounded waits: a hung API endpoint must fail the task (which
  // Spark retries) rather than wedge an executor thread forever
  @transient private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()
  override def get(entity: String, sessionKey: Option[Long],
                   driver: Long): Seq[InternalRow] = {
    val params = sessionKey.map(sk => s"session_key=$sk").toSeq ++
      (if (driver >= 0) Seq(s"driver_number=$driver") else Nil)
    val qs = if (params.isEmpty) "" else params.mkString("?", "&", "")
    val uri = java.net.URI.create(s"$baseUrl/$entity$qs")
    val resp = client.send(
      java.net.http.HttpRequest.newBuilder(uri)
        .timeout(java.time.Duration.ofSeconds(30)).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 200   => Openf1Json.decode(entity, resp.body())
      case 429   => throw new Openf1Api.RateLimitedException
      case other => throw new java.io.IOException(s"openf1 GET $uri -> HTTP $other")
    }
  }
}

/** Schema-driven decode of an openf1 JSON array response (field names
  * match the API's own keys, which the F1Schemas columns mirror).
  * Timestamps are ISO-8601 with offset (reference P5 parse), stored
  * as Spark micros. */
private[openf1] object Openf1Json {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def decode(entity: String, body: String): Seq[InternalRow] = {
    val schema = Openf1Api.schemaFor(entity)
    val root = mapper.readTree(body)
    require(root.isArray, s"expected a JSON array from /$entity")
    root.elements().asScala.map { node =>
      new GenericInternalRow(
        schema.fields.map(f => conv(node.get(f.name), f)).toArray[Any])
    }.toSeq
  }

  /** Strict: only null/missing maps to NULL; a non-coercible node
    * (API drift — a string where a number belongs) THROWS rather than
    * taking Jackson's silent 0/0.0/false defaults, which would
    * fabricate values row after row with nothing failing. */
  private def conv(v: com.fasterxml.jackson.databind.JsonNode,
                   f: StructField): Any = {
    def bad() = throw new IllegalArgumentException(
      s"openf1 field '${f.name}': cannot decode ${v.getNodeType} as ${f.dataType}")
    if (v == null || v.isNull) null
    else f.dataType match {
      case LongType    => if (v.isIntegralNumber) v.asLong() else bad()
      case DoubleType  => if (v.isNumber) v.asDouble() else bad()
      case BooleanType => if (v.isBoolean) v.asBoolean() else bad()
      case StringType  => if (v.isTextual) UTF8String.fromString(v.asText()) else bad()
      case TimestampType =>
        if (!v.isTextual) bad()
        val i = java.time.OffsetDateTime.parse(v.asText()).toInstant
        i.getEpochSecond * 1000000L + i.getNano / 1000
      case other =>
        throw new IllegalArgumentException(s"unsupported openf1 field type: $other")
    }
  }
}

/** Decorator simulating a rate-limited API: the FIRST get() per
  * (entity, driver) on each instance throws 429, then delegates.
  * State is per-instance (one per scan — and per task after
  * serialization), so every flaky scan genuinely drives the retry
  * path. */
final class FlakyTransport(inner: Openf1Transport) extends Openf1Transport {
  private val attempts = new ConcurrentHashMap[(String, Long), Integer]()
  override def get(entity: String, sessionKey: Option[Long],
                   driver: Long): Seq[InternalRow] = {
    if (attempts.merge((entity, driver), 1, (a, b) => a + b) == 1) {
      Openf1Api.retriesServed.incrementAndGet()
      throw new Openf1Api.RateLimitedException
    }
    inner.get(entity, sessionKey, driver)
  }
}

/** Connector-side API logic: schemas, partition planning inputs, and
  * the retry policy wrapped around ANY [[Openf1Transport]]. */
object Openf1Api {

  final class RateLimitedException extends RuntimeException("HTTP 429")

  /** S9 — retry/backoff contract of helper_functions.get_with_retry:
    * 429 → sleep and retry until success; anything else propagates. */
  def withRetry[T](maxAttempts: Int = 5, backoffMs: Long = 10)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case _: RateLimitedException if attempt < maxAttempts - 1 =>
          attempt += 1
          Thread.sleep(backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Observability hook for specs: total simulated 429s served. */
  val retriesServed = new java.util.concurrent.atomic.AtomicLong(0)

  /** Shared request pacing + 429 coordination for every partition
    * reader in this executor JVM (see [[RateLimiter]]). The default
    * budget is deliberately generous for the in-process fixture/test
    * transports; a deployment against the real API tunes it to the
    * published request budget via its own instance. */
  val limiter = new RateLimiter(ratePerSec = 200, burst = 64)

  def schemaFor(entity: String): StructType = entity match {
    case "laps"     => F1Schemas.laps
    case "stints"   => F1Schemas.stints
    case "drivers"  => F1Schemas.drivers
    case "sessions" => F1Schemas.sessions
    case other => throw new IllegalArgumentException(s"unknown openf1 entity: $other")
  }

  /** One retried page fetch through the transport seam: paced by the
    * shared [[limiter]], and any 429 feeds the shared penalty window
    * before the per-call retry loop backs off — so concurrent
    * partitions recover staggered instead of in lockstep. */
  def fetch(transport: Openf1Transport, entity: String,
            sessionKey: Option[Long], driver: Long): Seq[InternalRow] =
    withRetry() {
      limiter.acquire()
      try transport.get(entity, sessionKey, driver)
      catch { case e: RateLimitedException => limiter.on429(); throw e }
    }

  /** Project full-schema rows to the pruned reader schema (no-op when
    * nothing was pruned) — shared by the batch reader and the
    * micro-batch partition builder. */
  def project(rows: Seq[InternalRow], full: StructType,
              required: StructType): Seq[InternalRow] =
    if (required.length == full.length) rows
    else rows.map { r =>
      new GenericInternalRow(required.fieldNames.map { n =>
        val i = full.fieldIndex(n)
        r.get(i, full(i).dataType)
      }.toArray[Any])
    }

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  private[openf1] def rows(entity: String, sessionKey: Option[Long], driver: Long): Seq[InternalRow] = {
    // driver < 0 is the no-driver_number-param request (partition
    // planning's GET /drivers enumeration): match every driver.
    def keep(sk: Long, d: Long): Boolean =
      sessionKey.forall(_ == sk) && (driver < 0 || d == driver)
    entity match {
      case "laps" => FixtureGen.laps.collect {
        case (sk, d, lap, start, s1, s2, s3, dur, pit) if keep(sk, d) =>
          new GenericInternalRow(Array[Any](sk, d, lap, micros(start),
            s1.orNull, s2.orNull, s3.orNull, dur.orNull, pit))
      }
      case "stints" => FixtureGen.stints.collect {
        case (sk, d, stint, lo, hi, compound, age) if keep(sk, d) =>
          new GenericInternalRow(Array[Any](sk, d, stint, lo, hi,
            UTF8String.fromString(compound), age))
      }
      case "drivers" => FixtureGen.drivers.collect {
        case (sk, d, acr, team, color) if keep(sk, d) =>
          new GenericInternalRow(Array[Any](sk, d, UTF8String.fromString(acr),
            UTF8String.fromString(team), UTF8String.fromString(color)))
      }
      case "sessions" => FixtureGen.sessions.collect {
        case (sk, mk, name, tpe, circuit, start, end) if sessionKey.forall(_ == sk) =>
          new GenericInternalRow(Array[Any](sk, mk, UTF8String.fromString(name),
            UTF8String.fromString(tpe), UTF8String.fromString(circuit),
            micros(start), micros(end)))
      }
    }
  }
}
