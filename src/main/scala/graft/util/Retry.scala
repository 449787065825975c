package graft.util

import scala.concurrent.duration._
import scala.util.control.NonFatal

/** Bounded retry with exponential backoff for sink/storage operations
  * (reference analog: util/Retry.scala — semantics only). */
object Retry {

  def withBackoff[T](
      maxAttempts: Int = 3,
      initialDelay: FiniteDuration = 100.millis,
      factor: Double = 2.0,
      onFailure: Throwable => Unit = _ => ())(op: => T): T = {
    require(maxAttempts >= 1)
    var attempt = 0
    var delayMs = initialDelay.toMillis.toDouble
    var last: Throwable = null
    while (attempt < maxAttempts) {
      try return op
      catch {
        // NonFatal only: retrying an OutOfMemoryError hides a dying JVM,
        // and swallowing InterruptedException would delay a streaming
        // query's cancellation by maxAttempts × backoff while clearing
        // the thread's interrupt status
        case NonFatal(e) =>
          last = e
          onFailure(e)
          attempt += 1
          if (attempt < maxAttempts) {
            Thread.sleep(delayMs.toLong)
            // double arithmetic, not FiniteDuration * Double (which
            // widens to Duration and can overflow to Inf)
            delayMs = math.min(delayMs * factor, 3600000.0)
          }
      }
    }
    throw last
  }
}
