package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{RateLimiter, RateLimiters}
import graft.ts.model.Period

/** Sliding-window rate limiter semantics with a virtual clock, mirroring the
  * reference's weather/test/test_rate_limiter.py:11-85 (trip at the limit,
  * release when the window slides past, stacked limiters).
  */
class RateLimiterSpec extends AnyFunSuite {

  private val S = Period.Second

  private class Clock(var now: Long = 0L) extends (() => Long) {
    def apply(): Long = now
  }

  test("allows up to the limit, then trips") {
    val clock = new Clock
    val rl = new RateLimiter(3, 10 * S, clock)
    assert(rl.tryAcquire()); assert(rl.tryAcquire()); assert(rl.tryAcquire())
    assert(!rl.tryAcquire())
    assert(rl.waitTimeNs() == 10 * S) // oldest stamp at t=0 expires at t=10s
  }

  test("releases when the window slides past the oldest action") {
    val clock = new Clock
    val rl = new RateLimiter(2, 10 * S, clock)
    assert(rl.tryAcquire())          // t=0
    clock.now = 4 * S
    assert(rl.tryAcquire())          // t=4
    assert(!rl.tryAcquire())
    clock.now = 10 * S + 1           // first stamp now outside the window
    assert(rl.waitTimeNs() == 0L)
    assert(rl.tryAcquire())
  }

  test("no trip when actions are spaced wider than the window") {
    val clock = new Clock
    val rl = new RateLimiter(1, 5 * S, clock)
    (0 until 10).foreach { i =>
      clock.now = i * 6 * S
      assert(rl.tryAcquire(), s"action $i should pass")
    }
  }

  test("stacked limiters: burst AND sustained must both allow (45/10s + 450/h shape)") {
    val clock = new Clock
    val burst = new RateLimiter(2, 10 * S, clock)
    val sustained = new RateLimiter(3, 3600 * S, clock)
    val stack = new RateLimiters(Seq(burst, sustained))

    assert(stack.tryAcquire()); assert(stack.tryAcquire())
    assert(!stack.tryAcquire())            // burst trips first
    clock.now = 11 * S
    assert(stack.tryAcquire())             // burst released; 3rd sustained slot
    assert(!stack.tryAcquire())            // sustained now trips
    assert(stack.waitTimeNs() > 10 * S)    // must wait for the hour window
    clock.now = 3600 * S + 1
    assert(stack.tryAcquire())
  }
}
