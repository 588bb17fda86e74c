package graft.enrich

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** The driver-hosted exact global limiter: one token bucket serves every
  * client over a one-round-trip socket protocol. Assertions use generous
  * tolerances — the box's scheduler can delay a client, which only SHRINKS
  * its assigned wait (the schedule itself stays exact server-side).
  */
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
