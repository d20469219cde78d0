package graft.sources.openf1

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic (fake-clock) contract of the shared rate limiter:
  * burst then pacing, one joined penalty window per throttling burst,
  * STAGGERED re-entry slots after a penalty, and exponential penalty
  * growth only on prompt re-throttle.
  */
class RateLimiterSpec extends AnyFunSuite {

  /** Fake time: every sleep is recorded; `advanceOnSleep` models a
    * SERIAL caller (the sleep passes wall time) vs CONCURRENT callers
    * (each books its slot at the same instant and they all wait in
    * parallel, so the clock must not move between bookings). */
  private class Harness(rate: Double, burst: Int,
                        baseMs: Long = 50, maxMs: Long = 2000,
                        advanceOnSleep: Boolean = true) {
    var now = 0L
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val rl = new RateLimiter(rate, burst, baseMs, maxMs,
      nowNanos = () => now,
      sleeper = n => { sleeps += n; if (advanceOnSleep) now += n })
    def ms(n: Long): Long = n * 1000000L
  }

  test("burst acquires pass without sleeping; the next one is paced") {
    val h = new Harness(rate = 10, burst = 4) // interval = 100ms
    (1 to 4).foreach(_ => h.rl.acquire())
    assert(h.sleeps.isEmpty, "burst allowance must not sleep")
    h.rl.acquire()
    assert(h.sleeps.toSeq === Seq(h.ms(100)), "5th call waits one interval")
  }

  test("idle time refills the burst allowance") {
    val h = new Harness(rate = 10, burst = 2)
    (1 to 2).foreach(_ => h.rl.acquire())
    h.now += h.ms(10000) // long idle
    (1 to 2).foreach(_ => h.rl.acquire())
    assert(h.sleeps.isEmpty)
  }

  test("429s inside one throttling burst join a single penalty window") {
    val h = new Harness(rate = 10, burst = 8)
    h.rl.on429()
    h.now += h.ms(1) // more 429s arrive while the window is open
    h.rl.on429()
    h.rl.on429()
    assert(h.rl.penaltiesOpened === 1L)
    assert(h.rl.currentPenaltyMs === 50L)
  }

  test("blocked callers re-enter on distinct staggered slots") {
    // CONCURRENT callers: all three hit acquire while the window is
    // open (clock fixed at 0), so they must not all wake at 50ms —
    // slots are 150/250/350ms (window end + k*interval)
    val h = new Harness(rate = 10, burst = 8, advanceOnSleep = false)
    h.rl.on429() // window: [0, 50ms)
    val waits = (1 to 3).map { _ =>
      val before = h.sleeps.size
      h.rl.acquire()
      assert(h.sleeps.size === before + 1, "penalized caller must wait")
      h.sleeps.last // booked at now=0, so the wait IS the wake time
    }
    assert(waits.distinct.size === 3, s"slots must be distinct: $waits")
    assert(waits === waits.sorted)
    val gaps = waits.sliding(2).map { case Seq(a, b) => b - a }.toSeq
    assert(gaps.forall(_ >= h.ms(100)), s"slots at least one interval apart: $gaps")
    assert(waits.head >= h.ms(50), "no slot may land inside the window")
  }

  test("prompt re-throttle doubles the penalty, capped; late 429 resets") {
    val h = new Harness(rate = 10, burst = 8, baseMs = 50, maxMs = 300)
    h.rl.on429()
    assert(h.rl.currentPenaltyMs === 50L)
    // window ends at 50ms; a 429 shortly after (within the grace
    // span) means the estimate was too optimistic — double
    h.now = h.ms(60)
    h.rl.on429()
    assert(h.rl.currentPenaltyMs === 100L)
    h.now = h.ms(170)
    h.rl.on429()
    assert(h.rl.currentPenaltyMs === 200L)
    h.now = h.ms(380)
    h.rl.on429()
    assert(h.rl.currentPenaltyMs === 300L, "cap holds")
    // long quiet stretch: the next 429 is a fresh event, back to base
    h.now = h.ms(100000)
    h.rl.on429()
    assert(h.rl.currentPenaltyMs === 50L)
    assert(h.rl.penaltiesOpened === 5L)
  }

  test("acquire after an expired penalty window does not sleep (burst refilled)") {
    val h = new Harness(rate = 10, burst = 4)
    h.rl.on429()
    h.now = h.ms(10000) // penalty long gone, bucket refilled
    h.rl.acquire()
    assert(h.sleeps.isEmpty)
  }
}
