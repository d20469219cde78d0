package graft.sources.openf1

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** `spark.readStream.format("openf1")` — the live-session analogue of
  * the reference dashboard's re-poll loop
  * (/root/reference/dashboard.py:89-99): each trigger re-queries the
  * API through the SAME retry-wrapped transport seam the batch scan
  * uses, and snapshot diffing turns the repeated full-page fetches
  * into an exactly-once incremental stream on the Spark side.
  *
  * Offset design — why a poll sequence number, not max event time:
  * a poll issues one request per driver SEQUENTIALLY, so a lap can
  * materialize mid-poll with an event time below the frontier a
  * later driver's page just established; an event-time offset would
  * then sit above that lap forever and silently drop it. The API has
  * a stable primary key per entity (laps: session/driver/lap_number),
  * so instead each `latestOffset` diffs the fresh page against the
  * keys already served and stages only unseen rows as the next
  * batch — immune to mid-poll arrival and out-of-order event times.
  *
  * Contract and scale posture:
  *  - the REST API has no `since=` parameter (the reference re-fetches
  *    whole pages per interaction), so the TRANSPORT cost per trigger
  *    is O(session size) — inherent to the API; the key diff makes
  *    everything downstream of the source incremental;
  *  - driver-side state is the served key set plus uncommitted staged
  *    pages — bounded by one session's page (kilobytes), pruned at
  *    `commit`;
  *  - within a run the stream is exactly-once. Across a RESTART a
  *    REST page is not replayable, so recovery re-serves the whole
  *    current page once (at-least-once; pair with
  *    `StreamingOps.dedupWithinWatermark` when a checkpointed
  *    pipeline needs exactly-once across restarts);
  *  - rows ride inside the InputPartitions (the driver already holds
  *    the page it polled; re-fetching per executor would double the
  *    API load for data measured in kilobytes per trigger);
  *  - all offset/plan/commit calls come from the query's single
  *    MicroBatchExecution thread, so plain mutable state suffices.
  */
private[openf1] object Openf1MicroBatch {
  /** Primary key per entity; entities with one can stream. Stints and
    * drivers are pure dimensions — batch-only. */
  def streamKey(entity: String): Option[Seq[String]] = entity match {
    case "laps"     => Some(Seq("session_key", "driver_number", "lap_number"))
    case "sessions" => Some(Seq("session_key"))
    case _          => None
  }
}

private[openf1] case class PollSeqOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[openf1] class Openf1MicroBatchStream(
    entity: String, sessionKey: Option[Long], driverNumber: Option[Long],
    transport: Openf1Transport, required: StructType)
    extends MicroBatchStream {

  private val full = Openf1Api.schemaFor(entity)
  private val keyIdx: Seq[Int] = Openf1MicroBatch.streamKey(entity)
    .getOrElse(throw new IllegalArgumentException(
      s"openf1 entity '$entity' has no primary key; streaming needs one"))
    .map(full.fieldIndex)

  private def keyOf(r: InternalRow): Seq[Any] =
    keyIdx.map(i => if (r.isNullAt(i)) null else r.get(i, full(i).dataType))

  // single-threaded (MicroBatchExecution); bounded by one page
  private val seen = mutable.HashSet[Seq[Any]]()
  private val staged = mutable.TreeMap[Long, Array[InternalRow]]()
  private var seq = 0L

  private def poll(): Seq[InternalRow] = {
    val drivers =
      if (entity == "sessions") Seq(-1L)
      else {
        val dSchema = Openf1Api.schemaFor("drivers")
        val idx = dSchema.fieldIndex("driver_number")
        val all = Openf1Api.fetch(transport, "drivers", sessionKey, -1L)
          .map(_.getLong(idx)).distinct
        driverNumber.map(d => all.filter(_ == d)).getOrElse(all)
      }
    drivers.flatMap(d => Openf1Api.fetch(transport, entity, sessionKey, d))
  }

  /** Diff a fresh page against the served keys and absorb the rest. */
  private def unseenFrom(page: Seq[InternalRow]): Seq[InternalRow] = {
    val fresh = page.filter(r => !seen.contains(keyOf(r)))
    fresh.foreach(r => seen += keyOf(r))
    fresh
  }

  override def initialOffset(): Offset = PollSeqOffset(0L)
  override def deserializeOffset(json: String): Offset = PollSeqOffset(json.toLong)

  override def latestOffset(): Offset = {
    val fresh = unseenFrom(poll())
    if (fresh.nonEmpty) { seq += 1; staged(seq) = fresh.toArray }
    PollSeqOffset(seq)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[PollSeqOffset].n
    val hi = end.asInstanceOf[PollSeqOffset].n
    val expected = (lo + 1) to hi
    val rows: Seq[InternalRow] =
      if (expected.isEmpty) Nil
      else if (expected.forall(staged.contains)) expected.flatMap(staged(_))
      else {
        // restart recovery: the staged pages died with the previous
        // run and a REST page is not replayable — serve the whole
        // current page once, and stage it so a re-plan of this same
        // range is idempotent
        val fresh = unseenFrom(poll())
        if (seq < hi) seq = hi
        expected.init.foreach(s => if (!staged.contains(s)) staged(s) = Array.empty)
        staged(hi) = staged.getOrElse(hi, Array.empty[InternalRow]) ++ fresh
        expected.flatMap(staged(_))
      }
    // project to the pruned schema BEFORE shipping rows in the task
    Array(Openf1StreamPartition(
      Openf1Api.project(rows, full, required).toArray))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val rows = p.asInstanceOf[Openf1StreamPartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = rows(i)
          override def close(): Unit = ()
        }
      }
    }

  override def commit(end: Offset): Unit = {
    val n = end.asInstanceOf[PollSeqOffset].n
    staged.keys.takeWhile(_ <= n).toList.foreach(staged.remove)
  }

  override def stop(): Unit = ()
}

private[openf1] case class Openf1StreamPartition(rows: Array[InternalRow])
    extends InputPartition
