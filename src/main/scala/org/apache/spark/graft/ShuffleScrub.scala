package org.apache.spark.graft

import org.apache.spark.{MapOutputTrackerMaster, SparkContext}

/** Scoped shuffle-file cleanup for sequential multi-pass operators
  * (the sharded exact similarity joins in `graft.ext.Dedup`).
  *
  * Why this exists: Spark reclaims shuffle files through the
  * ContextCleaner, which fires on WEAK-REFERENCE GC of the shuffle
  * dependency objects — so a driver that runs 71 sequential passes,
  * each checkpointing its survivors and dropping every reference to
  * the pass's plan, still accumulates ALL passes' shuffle spill on
  * disk until a full GC happens to run. The original workaround was a
  * `System.gc()` per pass, which on a 48 g driver heap is a multi-
  * second stop-the-world pause ×(passes) of pure overhead. This
  * helper replaces it with the targeted form of the SAME cleanup:
  * snapshot the driver's registered shuffle ids before a pass, and
  * after the pass's output is safely materialized (localCheckpoint +
  * count), hand exactly the new ids to `ContextCleaner.doCleanupShuffle`
  * — the identical code path the GC hook runs, minus the GC.
  *
  * Safety contract (same as GC-driven cleanup): callers must only
  * scrub shuffles whose consumers are all fully materialized —
  * a checkpointed frame's blocks never re-read upstream shuffles, so
  * a pass's internal shuffles are dead the moment its checkpoint is
  * counted. Shuffles registered BEFORE the snapshot (e.g. shared
  * prefix/doc-set checkpoints built once and re-read by every pass)
  * are never touched. Lives under `org.apache.spark` because the
  * MapOutputTrackerMaster registry and `SparkContext.cleaner` are
  * `private[spark]` — this is driver-side bookkeeping, not an
  * executor-facing API.
  */
object ShuffleScrub {

  /** Shuffle ids currently registered on the driver (empty when not
    * running as the tracker master, i.e. never on an executor). */
  def liveShuffleIds(sc: SparkContext): Set[Int] =
    sc.env.mapOutputTracker match {
      case m: MapOutputTrackerMaster => m.shuffleStatuses.keySet.toSet
      case _ => Set.empty
    }

  /** Synchronously remove the given shuffles' map-output state and
    * disk files — the ContextCleaner's own cleanup, invoked eagerly
    * instead of waiting for a full GC to enqueue the weak refs. */
  def removeShuffles(sc: SparkContext, ids: Iterable[Int]): Unit =
    sc.cleaner.foreach { c =>
      ids.foreach(id => c.doCleanupShuffle(id, blocking = true))
    }

  /** Run `body`, then scrub every shuffle it registered. The caller
    * guarantees `body`'s visible result is fully materialized (the
    * checkpoint-then-count pattern) before returning it. */
  def scoped[T](sc: SparkContext)(body: => T): T = {
    val before = liveShuffleIds(sc)
    val out = body
    removeShuffles(sc, liveShuffleIds(sc) -- before)
    out
  }
}
