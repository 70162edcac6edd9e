package graft.etl

import scala.collection.mutable

/** Sliding-window rate limiter: allow at most `actionLimit` actions per
  * `timespanNs`; `waitFor` reports how long a caller must wait before the
  * next action (reference: weather/utilities/rate_limiter.py:10-95 — deque
  * of the last N action timestamps, trip if the Nth-last is younger than the
  * window). Limiters stack (e.g., 45/10 s + 450/h,
  * reference: weather/scripts/start_dtss_host.py:18-22).
  *
  * This is *connector-side* throttling for API-backed sources — the engine's
  * analog of a source's maxRatePerTrigger — not an engine operator
  * (SURVEY.md §4). Clock is injectable for deterministic tests.
  */
final class RateLimiter(actionLimit: Int, timespanNs: Long, clock: () => Long) {
  private val stamps = mutable.ArrayDeque.empty[Long]

  def this(actionLimit: Int, timespanNs: Long) =
    this(actionLimit, timespanNs, () => System.nanoTime())

  /** Nanoseconds to wait before the next action is allowed (0 = go). */
  def waitTimeNs(): Long = synchronized {
    trim()
    if (stamps.size < actionLimit) 0L
    else (stamps.head + timespanNs) - clock()
  }

  def tryAcquire(): Boolean = synchronized {
    if (waitTimeNs() > 0) false
    else { stamps.append(clock()); true }
  }

  /** Record an action unconditionally (the reference logs actions after the
    * blocking check).
    */
  def record(): Unit = synchronized { stamps.append(clock()); trim() }

  private def trim(): Unit = {
    val cutoff = clock() - timespanNs
    while (stamps.nonEmpty && stamps.head <= cutoff) stamps.removeHead()
    while (stamps.size > actionLimit) stamps.removeHead()
  }
}

/** Stacked limiters: an action may proceed only when every limiter allows it. */
final class RateLimiters(limiters: Seq[RateLimiter]) {
  def waitTimeNs(): Long = limiters.map(_.waitTimeNs()).max
  def tryAcquire(): Boolean = synchronized {
    if (waitTimeNs() > 0) false
    else { limiters.foreach(_.record()); true }
  }
}
