package graft.sources.openf1

/** Executor-local coordination against the API's GLOBAL rate limit.
  *
  * Each (session, driver) partition retries its own 429s
  * independently; without coordination a 429 caused by the API
  * throttling the whole client makes every partition sleep the same
  * fixed backoff and re-fire simultaneously — a synchronized retry
  * storm that re-trips the limit at high parallelism. One instance of
  * this limiter is shared by every partition reader in the executor
  * JVM ([[Openf1Api.limiter]]):
  *
  *  - request pacing (GCRA token bucket): steady-state requests are
  *    spaced `1/ratePerSec` apart after a `burst`-deep allowance, so
  *    the client respects the API budget before any 429 happens;
  *  - shared penalty window: a 429 observed by ANY caller pauses all
  *    of them; 429s that arrive while a window is already open JOIN
  *    it (one throttling event, one window), while a fresh 429 soon
  *    after a window ends DOUBLES it (the API is telling us the
  *    budget estimate is still too high), capped;
  *  - staggered re-entry: callers blocked by a penalty take distinct
  *    re-entry slots one token-interval apart past the window's end,
  *    so recovery ramps up instead of re-firing in lockstep.
  *
  * Clock and sleeper are injectable so RateLimiterSpec drives it
  * deterministically; production uses System.nanoTime/Thread.sleep.
  */
final class RateLimiter(ratePerSec: Double, burst: Int,
                        basePenaltyMs: Long = 50, maxPenaltyMs: Long = 2000,
                        nowNanos: () => Long = System.nanoTime,
                        sleeper: Long => Unit = RateLimiter.sleepNanos) {
  require(ratePerSec > 0, "ratePerSec must be positive")
  require(burst >= 1, "burst must be at least 1")

  private val intervalNanos = (1e9 / ratePerSec).toLong.max(1L)
  private val basePenaltyNanos = basePenaltyMs * 1000000L
  private val maxPenaltyNanos = maxPenaltyMs * 1000000L

  // GCRA state: earliest time the bucket is fully conformant again.
  // Initialized from the clock, NOT a sentinel: `tat - burst*interval`
  // must never underflow (a Long.MinValue sentinel wraps it positive
  // and the first acquire sleeps ~forever).
  private var tat = nowNanos()
  private var penaltyUntil = Long.MinValue
  private var penaltyNanos = 0L
  private var lastSlot = Long.MinValue
  private var penaltiesOpenedCount = 0L

  /** Blocks (one sleep) until a request may be sent. */
  def acquire(): Unit = {
    val wait = synchronized {
      val now = nowNanos()
      var sendAt = math.max(now, tat - (burst - 1).toLong * intervalNanos)
      if (penaltyUntil > now) {
        // distinct staggered slot per blocked caller
        lastSlot = math.max(penaltyUntil, lastSlot) + intervalNanos
        sendAt = math.max(sendAt, lastSlot)
      }
      // tat tracks the latest BOOKED send, not just one interval past
      // max(now, tat): with staggered slots booked deep into the
      // post-penalty future, a stale tat would let callers arriving
      // just after the window expires spend the full burst allowance
      // on top of the scheduled re-entries — exceeding the intended
      // rate at exactly the moment the API is most sensitive
      tat = math.max(math.max(now, tat), sendAt) + intervalNanos
      sendAt - now
    }
    if (wait > 0) sleeper(wait)
  }

  /** Report an observed 429. */
  def on429(): Unit = synchronized {
    val now = nowNanos()
    if (now < penaltyUntil) {
      // concurrent 429s from the same throttling burst join the window
    } else {
      // grace window after a penalty ends: a prompt re-throttle means
      // the penalty was too short — double it; otherwise start fresh
      penaltyNanos =
        if (now < penaltyUntil + 4 * penaltyNanos)
          math.min(penaltyNanos * 2, maxPenaltyNanos)
        else basePenaltyNanos
      penaltyUntil = now + penaltyNanos
      lastSlot = math.max(lastSlot, penaltyUntil)
      penaltiesOpenedCount += 1
    }
  }

  /** Observability (specs): number of distinct penalty windows. */
  def penaltiesOpened: Long = synchronized(penaltiesOpenedCount)

  /** Observability (specs): current penalty length, ms. */
  def currentPenaltyMs: Long = synchronized(penaltyNanos / 1000000L)
}

object RateLimiter {
  private def sleepNanos(n: Long): Unit = {
    val ms = n / 1000000L
    val rem = (n % 1000000L).toInt
    if (ms > 0 || rem > 0) Thread.sleep(ms, rem)
  }
}
