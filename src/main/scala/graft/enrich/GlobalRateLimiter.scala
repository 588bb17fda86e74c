package graft.enrich

import java.io.DataOutputStream
import java.net.{InetAddress, ServerSocket, Socket}
import java.util.concurrent.atomic.AtomicBoolean

/** Exact GLOBAL rate limiting (E3) as a driver-hosted side service.
  *
  * The reference's `AsyncLimiter(rpm)` is exact because Program 2 is one
  * process (`src/program2_ai_processor.py:772-787`); the distributed
  * analogue needs one process to own the token-bucket clock. The driver
  * hosts it: executors do a single round trip per permit — connect, read an
  * 8-byte wait-in-millis computed atomically against the shared bucket, and
  * sleep locally. Grants are serialized server-side, so the global request
  * schedule is EXACTLY one permit per `60000/rpm` ms across every
  * partition of every executor — not the per-partition `rpm/N`
  * approximation (which [[RateLimiter]] remains, as the zero-infra default).
  *
  * Scale check: one short-lived TCP round trip per LLM request. At the
  * reference's own envelope (10 000 rpm ≈ 167 req/s) this is negligible
  * against multi-second LLM calls; the accept loop is the driver's only
  * cost. If the limit itself is the bottleneck, the answer is a higher
  * configured rpm, not more limiter servers.
  */
final class RateLimiterServer private (server: ServerSocket, intervalMs: Double) {
  @volatile private var nextFreeAtMs: Double = 0.0
  private val running = new AtomicBoolean(true)

  /** Atomic bucket math: assign the next free slot, return the wait. */
  private def grantWaitMs(): Long = synchronized {
    val now = System.currentTimeMillis().toDouble
    val target = math.max(now, nextFreeAtMs)
    nextFreeAtMs = target + intervalMs
    math.max(0L, (target - now).toLong)
  }

  private val acceptLoop = new Thread("graft-rate-limiter-server") {
    override def run(): Unit =
      while (running.get()) {
        try {
          val sock = server.accept()
          // grant + reply is microseconds; handle inline (no thread churn)
          try {
            val out = new DataOutputStream(sock.getOutputStream)
            out.writeLong(grantWaitMs())
            out.flush()
          } finally sock.close()
        } catch { case _: java.io.IOException => () /* closed or client gone */ }
      }
  }
  acceptLoop.setDaemon(true)
  acceptLoop.start()

  def port: Int = server.getLocalPort

  def stop(): Unit = {
    running.set(false)
    try server.close() catch { case _: java.io.IOException => () }
  }
}

object RateLimiterServer {
  /** Bind on all interfaces (executors connect via the driver host). */
  def start(ratePerMinute: Double): RateLimiterServer = {
    require(ratePerMinute > 0, "global rate limiting requires a positive rpm")
    new RateLimiterServer(new ServerSocket(0), 60000.0 / ratePerMinute)
  }
}

/** Executor-side handle: each `acquire()` asks the server for its slot and
  * sleeps out the answer locally. Fails OPEN after `maxAttempts` connection
  * failures (one warning, then unthrottled) — the reference has no
  * equivalent failure mode (single process), and a dead driver socket
  * should degrade throughput guarantees, not abort the enrichment job.
  */
final class RemoteRateLimiter(
    host: String, port: Int, sleeper: Long => Unit = Thread.sleep,
    maxAttempts: Int = 3)
    extends RateLimiter(0.0, sleeper) {

  @transient private lazy val warned = new AtomicBoolean(false)

  override def acquire(): Unit = {
    var attempt = 0
    while (attempt < maxAttempts) {
      try {
        val sock = new Socket()
        try {
          // bounded connect/read so a HUNG (not just dead) server degrades
          // to fail-open instead of blocking the enrichment task forever
          sock.connect(new java.net.InetSocketAddress(InetAddress.getByName(host), port), 5000)
          sock.setSoTimeout(5000)
          val in = new java.io.DataInputStream(sock.getInputStream)
          val waitMs = in.readLong()
          if (waitMs > 0) sleeper(waitMs)
          return
        } finally sock.close()
      } catch {
        case _: java.io.IOException => attempt += 1
      }
    }
    if (warned.compareAndSet(false, true))
      System.err.println(
        s"[enrich] rate-limiter server $host:$port unreachable; failing open (unthrottled)")
  }
}
