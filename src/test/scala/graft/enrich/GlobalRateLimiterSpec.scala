package graft.enrich

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** The driver-hosted exact global limiter: one token bucket serves every
  * client over a one-round-trip socket protocol. Assertions use generous
  * tolerances — the box's scheduler can delay a client, which only SHRINKS
  * its assigned wait (the schedule itself stays exact server-side).
  */
/** Executor-side in-flight tracker for the cross-partition cap test (top
  * level so the transport closure stays serializable; local[N] = one JVM).
  */
object ConcurrencyProbe {
  val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  val peak = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { inFlight.set(0); peak.set(0) }
}

class ProbeTransport extends LlmTransport {
  override def post(payload: LlmPayload): LlmResponse = {
    val n = ConcurrencyProbe.inFlight.incrementAndGet()
    ConcurrencyProbe.peak.updateAndGet(p => math.max(p, n))
    Thread.sleep(30)
    ConcurrencyProbe.inFlight.decrementAndGet()
    LlmResponse(200,
      """{"choices":[{"message":{"role":"assistant","content":"ok"}}]}""")
  }
}

class GlobalRateLimiterSpec extends graft.SparkSpec {

  test("sequential acquires are spaced one interval apart on the shared clock") {
    val srv = RateLimiterServer.start(ratePerMinute = 600) // 100 ms interval
    try {
      val waits = mutable.Buffer[Long]()
      val lim = new RemoteRateLimiter("127.0.0.1", srv.port, waits += _)
      (1 to 5).foreach(_ => lim.acquire())
      // first grant is immediate (wait 0 → sleeper not called)
      assert(waits.size == 4)
      assert(waits == waits.sorted) // cumulative schedule
      // 4th recorded wait targets slot t0+400ms; loop overhead only shrinks
      // it (generous lower bound: the box can stall a client ~200ms)
      assert(waits.last > 150 && waits.last <= 450, s"waits=$waits")
    } finally srv.stop()
  }

  test("concurrent acquires from many threads get distinct serialized slots") {
    val srv = RateLimiterServer.start(ratePerMinute = 600)
    try {
      val waits = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val pool = Executors.newFixedThreadPool(8)
      val start = new CountDownLatch(1)
      (1 to 8).foreach { _ =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            start.await()
            new RemoteRateLimiter("127.0.0.1", srv.port, waits.add(_)).acquire()
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(10, TimeUnit.SECONDS))
      val sorted = waits.asScala.toSeq.sorted
      // exactly one 0-wait grant (unrecorded); the rest spread up to ~700ms
      assert(sorted.size == 7, s"waits=$sorted")
      assert(sorted.last > 350, s"waits=$sorted") // schedule spans ~700ms
      assert(sorted.distinct.size >= 6) // serialized slots, not a shared 0
    } finally srv.stop()
  }

  test("fails open (no exception, no sleep) when the server is gone") {
    val srv = RateLimiterServer.start(ratePerMinute = 600)
    val port = srv.port
    srv.stop()
    Thread.sleep(50)
    val waits = mutable.Buffer[Long]()
    val lim = new RemoteRateLimiter("127.0.0.1", port, waits += _)
    lim.acquire() // must not throw
    assert(waits.isEmpty)
  }

  test("concurrency leases: at most maxConcurrent bodies run at once (E2 exact)") {
    val srv = RateLimiterServer.start(ratePerMinute = 6000000, maxConcurrent = 2)
    try {
      val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
      val peak = new java.util.concurrent.atomic.AtomicInteger(0)
      val lim = new RemoteConcurrencyLimiter("127.0.0.1", srv.port)
      val pool = Executors.newFixedThreadPool(8)
      (1 to 8).foreach { _ =>
        pool.submit(new Runnable {
          override def run(): Unit = lim.withSlot {
            val n = inFlight.incrementAndGet()
            peak.updateAndGet(p => math.max(p, n))
            Thread.sleep(60)
            inFlight.decrementAndGet()
            ()
          }
        })
      }
      pool.shutdown()
      assert(pool.awaitTermination(20, TimeUnit.SECONDS))
      assert(peak.get() >= 1 && peak.get() <= 2, s"peak=${peak.get()}")
      assert(srv.slotsInUse == 0) // every lease returned
    } finally srv.stop()
  }

  test("a dropped lease connection frees its slot (executor-death teardown)") {
    val srv = RateLimiterServer.start(ratePerMinute = 6000000, maxConcurrent = 1)
    try {
      // hold the single slot via a raw socket (no clean protocol release)
      val holder = new java.net.Socket()
      holder.connect(new java.net.InetSocketAddress("127.0.0.1", srv.port), 5000)
      holder.getOutputStream.write('C'); holder.getOutputStream.flush()
      new java.io.DataInputStream(holder.getInputStream).readLong() // granted
      val acquired = new CountDownLatch(1)
      val t = new Thread(() =>
        new RemoteConcurrencyLimiter("127.0.0.1", srv.port).withSlot {
          acquired.countDown()
        })
      t.start()
      // second acquire must queue while the slot is held...
      assert(!acquired.await(300, TimeUnit.MILLISECONDS))
      holder.close() // ...and proceed on TCP teardown alone
      assert(acquired.await(10, TimeUnit.SECONDS))
      t.join(10000)
    } finally srv.stop()
  }

  test("EnrichOperator exactGlobalConcurrency holds <=N in flight across partitions") {
    val srv = RateLimiterServer.start(ratePerMinute = 6000000, maxConcurrent = 2)
    try {
      import spark.implicits._
      ConcurrencyProbe.reset()
      // 4 partitions, each running a FULL-width local pool: 8 worker threads
      // compete for the server's 2 global slots
      val docs = spark.createDataset((1 to 12).map(i =>
        EnrichOperator.Doc(s"k$i", s"content $i"))).repartition(4)
      val port = srv.port // capture the port, not the (unserializable) server
      val out = EnrichOperator.enrich(
        docs, () => new ProbeTransport, "SYSTEM:\nsys\nUSER:\n{school_data}",
        EnrichConfig(maxConcurrent = 2, exactGlobalConcurrency = true),
        sleeper = _ => (),
        slotFactory = Some(() => new RemoteConcurrencyLimiter("127.0.0.1", port)))
      assert(out.collect().length == 12)
      assert(ConcurrencyProbe.peak.get() >= 1 && ConcurrencyProbe.peak.get() <= 2,
        s"peak=${ConcurrencyProbe.peak.get()}")
    } finally srv.stop()
  }

  test("EnrichJob end-to-end with exactGlobalRpm routes permits through the server") {
    val dir = java.nio.file.Files.createTempDirectory("grl").toString
    def write(p: String, c: String): Unit = {
      val path = java.nio.file.Paths.get(p)
      java.nio.file.Files.createDirectories(path.getParent)
      java.nio.file.Files.write(path, c.getBytes("UTF-8"))
    }
    (1 to 6).foreach(i => write(s"$dir/in/S$i.md", s"# School $i\ndata"))
    write(s"$dir/prompt.txt", "SYSTEM:\nsys\nUSER:\n{school_data}")
    val stats = EnrichJob.run(spark, s"$dir/in", s"$dir/outmd", s"$dir/outjson",
      s"$dir/prompt.txt",
      config = EnrichConfig(exactGlobalRpm = true, targetRpm = 600000))
    assert(stats.attempted == 6 && stats.successful == 6 && stats.failed == 0)
    assert(new java.io.File(s"$dir/outmd").list().count(_.endsWith(".md")) == 6)
  }
}
