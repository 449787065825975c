package graft.util

import scala.concurrent.duration._

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
    var delay = initialDelay
    var last: Throwable = null
    while (attempt < maxAttempts) {
      try return op
      catch {
        case e: Throwable =>
          last = e
          onFailure(e)
          attempt += 1
          if (attempt < maxAttempts) {
            Thread.sleep(delay.toMillis)
            delay = (delay * factor).asInstanceOf[FiniteDuration]
          }
      }
    }
    throw last
  }
}
