package graft.ext

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Run independent Spark ACTIONS concurrently from the driver —
  * guide §2.6: actions are only sequential because driver code calls
  * them sequentially, and the tail of any one job leaves most
  * executor slots idle. The store builders use this for their
  * artifact writes (bands/sets/params, postings/df/stats/positions,
  * centroids/codebook/params/codes): the artifacts share no state —
  * each is derived independently from the (checkpointed) input — so
  * their jobs legally interleave and back-fill each other's stage
  * tails. Commit/publish steps stay OUTSIDE this helper, in their
  * documented order.
  *
  * The pool is cached (unbounded) rather than fixed: builders nest
  * (ReleaseStore.build runs SignatureStore.build as one of its
  * thunks), and a fixed pool would deadlock when outer thunks occupy
  * every thread while waiting on inner ones. Realized concurrency is
  * bounded by the call structure (≤ ~8 thunks deep in any gate).
  *
  * Failure semantics: waits for ALL thunks to settle, then rethrows
  * the first failure — no write is silently abandoned mid-flight
  * while the caller proceeds to a commit.
  */
object Par {
  private lazy val pool = ExecutionContext.fromExecutorService(
    Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-par")
      t.setDaemon(true)
      t
    }))

  def run(thunks: (() => Unit)*): Unit = {
    if (thunks.sizeIs <= 1) { thunks.foreach(_.apply()); return }
    val fs = thunks.map(t => Future(t())(pool))
    val results = fs.map(f => Await.ready(f, Duration.Inf).value.get)
    results.collectFirst { case scala.util.Failure(e) => throw e }
  }
}
