package graft.util

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/** Periodic metric push — the loader-health counterpart of [[GraftMetrics]].
  *
  * The reference couples its in-process metric registry to external
  * reporters that ship snapshots out of the JVM
  * (`util/KafkaMetricsReporter.scala:23` bridges Kafka client metrics into
  * the registry; deployments push the registry to a gateway on a timer).
  * graft's analog snapshots [[GraftMetrics]] on a schedule and delivers one
  * JSON line per streaming query through a pluggable `transport`. The
  * newline-delimited-JSON file transport ships here (there is no gateway in
  * this environment); a real deployment swaps in an HTTP POST or producer
  * lambda without touching the reporter.
  *
  * Failure discipline: a throwing transport must never kill the scheduler
  * or the loader — failures are counted ([[pushFailures]]) and logged, and
  * the next tick retries from the current snapshot (push gateways are
  * level- not edge-triggered, so a missed tick loses nothing).
  */
final class MetricsPush(
    metrics: GraftMetrics,
    transport: String => Unit,
    intervalMs: Long) extends AutoCloseable {

  private val failures = new AtomicLong
  @volatile private var exec: ScheduledExecutorService = _

  def pushFailures: Long = failures.get()

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    }

  /** Snapshot every known query into one JSON line each. */
  def pushOnce(): Unit = metrics.queryNames.foreach { q =>
    val line =
      s"""{"ts_ms":${System.currentTimeMillis()},"query":"${jsonEscape(q)}",""" +
        s""""rows":${metrics.rowsLoaded(q)},"epochs":${metrics.epochsCommitted(q)},""" +
        s""""epoch_p50_ms":${metrics.epochLatencyMs(q, 0.5)},"epoch_p99_ms":${metrics.epochLatencyMs(q, 0.99)}}"""
    try transport(line)
    catch {
      case NonFatal(e) =>
        failures.incrementAndGet()
        System.err.println(s"[graft-metrics] push failed for '$q': ${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }

  /** Start the periodic reporter (daemon thread; idempotent). */
  def start(): MetricsPush = synchronized {
    if (exec == null) {
      exec = Executors.newSingleThreadScheduledExecutor { r =>
        val t = new Thread(r, "graft-metrics-push"); t.setDaemon(true); t
      }
      exec.scheduleAtFixedRate(() => pushOnce(), intervalMs, intervalMs, TimeUnit.MILLISECONDS)
    }
    this
  }

  /** Stop the scheduler and push one final snapshot (shutdown flush).
    * Awaits any in-flight scheduled push first — otherwise the flush can
    * interleave with it, double-emitting the tick and handing a custom
    * transport concurrent calls it was promised not to get. */
  override def close(): Unit = synchronized {
    if (exec != null) {
      exec.shutdown()
      exec.awaitTermination(10, TimeUnit.SECONDS)
      exec = null
    }
    pushOnce()
  }
}

object MetricsPush {

  /** Append-one-line-per-push NDJSON file transport. Appends are
    * synchronized on the transport instance (the scheduler is
    * single-threaded anyway; this also covers manual pushOnce calls). */
  def fileTransport(path: String): String => Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val lock = new Object
    line =>
      lock.synchronized {
        Files.write(p, (line + "\n").getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      }
  }

  /** Install a listener + file reporter pair on the session. */
  def install(spark: SparkSession, path: String, intervalMs: Long = 60000L): (GraftMetrics, MetricsPush) = {
    val m = GraftMetrics.install(spark)
    (m, new MetricsPush(m, fileTransport(path), intervalMs).start())
  }
}
