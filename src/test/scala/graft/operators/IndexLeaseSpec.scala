package graft.operators

import graft.SparkSpec

/** The single-writer contract, enforced ([[IndexLease]]): one marker file
  * beside the index dir, create-exclusive acquire, loud contention, stale
  * takeover. Every lifecycle operator (append/maintain/compact/rebuild/
  * delete/readmit) now runs inside [[IndexLease.withLease]], so these
  * drills cover the real operator surface, not just the primitive.
  */
class IndexLeaseSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def setMtime(p: String, t: Long): Unit = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(spark.sessionState.newHadoopConf())
      .setTimes(path, t, -1)
  }

  test("withLease: marker exists during the op, is gone after, result flows through") {
    val dir = s"${tmpDir("lease")}/idx"
    val marker = IndexLease.leasePath(dir)
    val out = IndexLease.withLease(dir) {
      assert(IndexFs.exists(marker), "lease marker absent while held")
      42
    }
    assert(out == 42)
    assert(!IndexFs.exists(marker), "lease marker leaked after release")
  }

  test("a held lease makes a second writer fail loudly, naming the holder") {
    val dir = s"${tmpDir("lease")}/idx"
    val marker = IndexLease.leasePath(dir)
    assert(IndexFs.createUtf8(marker, "other-daemon@host42/thread-7"))
    val e = intercept[IllegalStateException] {
      IndexLease.withLease(dir) { fail("op must not run under contention") }
    }
    assert(e.getMessage.contains("other-daemon@host42/thread-7"), e.getMessage)
    assert(e.getMessage.contains(dir), e.getMessage)
    // the loser never deleted the winner's lease
    assert(IndexFs.exists(marker))
    IndexFs.deleteFile(marker)
  }

  test("a crashed writer's stale lease is taken over") {
    val dir = s"${tmpDir("lease")}/idx"
    val marker = IndexLease.leasePath(dir)
    assert(IndexFs.createUtf8(marker, "crashed-daemon@gone/thread-1"))
    // age the marker past the default 30-minute stale window
    setMtime(marker, System.currentTimeMillis() - 31L * 60L * 1000L)
    val out = IndexLease.withLease(dir) { "recovered" }
    assert(out == "recovered")
    assert(!IndexFs.exists(marker))
  }

  test("nested lifecycle calls on the owning thread are reentrant; outermost frame releases") {
    val dir = s"${tmpDir("lease")}/idx"
    val marker = IndexLease.leasePath(dir)
    val out = IndexLease.withLease(dir) {
      val inner = IndexLease.withLease(dir) { 1 }
      // the inner frame must NOT have released the outer's lease
      assert(IndexFs.exists(marker), "inner frame released the outer lease")
      inner + 1
    }
    assert(out == 2)
    assert(!IndexFs.exists(marker))
  }

  test("an erroring op still releases the lease") {
    val dir = s"${tmpDir("lease")}/idx"
    intercept[RuntimeException] {
      IndexLease.withLease(dir) { sys.error("boom") }
    }
    assert(!IndexFs.exists(IndexLease.leasePath(dir)))
  }

  test("a second THREAD of the same JVM contends like a foreign writer") {
    val dir = s"${tmpDir("lease")}/idx"
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => IndexLease.withLease(dir) {
      entered.countDown()
      release.await()
    })
    t.start()
    entered.await()
    val e = intercept[IllegalStateException] {
      IndexLease.withLease(dir) { fail("must contend") }
    }
    assert(e.getMessage.contains("held by"), e.getMessage)
    release.countDown()
    t.join()
    assert(!IndexFs.exists(IndexLease.leasePath(dir)))
  }

  test("a held lease auto-renews: long ops never go stale, contenders still lose") {
    val dir = s"${tmpDir("lease")}/idx"
    val marker = IndexLease.leasePath(dir)
    val prev = sys.props.get("graft.lease.stale.ms")
    sys.props("graft.lease.stale.ms") = "600" // heartbeat every 200 ms
    try {
      IndexLease.withLease(dir) {
        val t0 = IndexFs.modificationTime(marker)
        Thread.sleep(1500) // several heartbeats; > 1 s so coarse (second-
        // granularity) local-FS mtimes still show the advance
        val t1 = IndexFs.modificationTime(marker)
        assert(t1 > t0, s"lease marker not renewed while held: $t0 -> $t1")
        // the renewed lease reads FRESH to a contender even though the
        // configured stale window (600 ms) has long elapsed since acquire
        val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
        val th = new Thread(() =>
          try IndexLease.withLease(dir) { fail("must contend") }
          catch { case x: Throwable => err.set(x) })
        th.start(); th.join()
        assert(err.get().isInstanceOf[IllegalStateException],
          s"expected loud contention, got ${err.get()}")
      }
      assert(!IndexFs.exists(marker))
    } finally prev match {
      case Some(v) => sys.props("graft.lease.stale.ms") = v
      case None => sys.props.remove("graft.lease.stale.ms")
    }
  }

  test("the real operator surface contends: a foreign lease blocks ivfDelete and maintain") {
    val dir = s"${tmpDir("lease_ivf")}/idx"
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    Similarity.ivfBuild(emb, "vec_id", "embedding", 4, dir)
    assert(IndexFs.createUtf8(IndexLease.leasePath(dir), "rival@box/thread-3"))
    val del = intercept[IllegalStateException] {
      Similarity.ivfDelete(spark, dir, Seq(1L).toDF("vec_id"), "vec_id")
    }
    assert(del.getMessage.contains("rival@box/thread-3"), del.getMessage)
    val m = intercept[IllegalStateException] {
      AnnMaintenance.maintain(spark, dir)
    }
    assert(m.getMessage.contains("rival@box/thread-3"), m.getMessage)
    IndexFs.deleteFile(IndexLease.leasePath(dir))
    // with the rival gone the same calls go through
    assert(Similarity.ivfDelete(spark, dir,
      Seq(1L).toDF("vec_id"), "vec_id") == 1L)
    assert(!AnnMaintenance.maintain(spark, dir).rebuilt)
  }

  test("release is owner-checked: a lease taken over mid-op is NOT deleted by the old holder") {
    // the mis-fired-takeover scenario: a writer hangs past the stale
    // window, its lease is taken over, it wakes and finishes — its
    // release must be a no-op, never a deletion of the NEW holder's live
    // lease (which would cascade the contract break to a third writer)
    val dir = s"${tmpDir("lease")}/idx"
    val marker = IndexLease.leasePath(dir)
    IndexLease.withLease(dir) {
      // simulate the takeover: our marker is replaced by another writer's
      IndexFs.deleteFile(marker)
      assert(IndexFs.createUtf8(marker, "usurper@elsewhere/thread-9"))
    }
    assert(IndexFs.exists(marker), "old holder's release deleted the usurper's lease")
    assert(IndexFs.readUtf8(marker) == "usurper@elsewhere/thread-9")
    IndexFs.deleteFile(marker)
  }

  test("mutual exclusion, not just loud contention: 8 threads x 5 " +
      "read-modify-writes under the lease lose no update") {
    // the property the lease actually exists for — a contender that
    // RETRIES (the documented operator response to the loud error) still
    // never interleaves with the holder's read-modify-write
    val dir = s"${tmpDir("lease_mutex")}/idx"
    val counter = s"$dir/counter.txt"
    IndexFs.writeUtf8(counter, "0")
    val threads = 8
    val perThread = 5
    val errs = java.util.concurrent.ConcurrentHashMap.newKeySet[Throwable]()
    val pool = (0 until threads).map { _ =>
      new Thread(() => {
        try {
          var done = 0
          while (done < perThread) {
            try {
              IndexLease.withLease(dir) {
                val v = IndexFs.readUtf8(counter).trim.toLong
                Thread.sleep(1) // widen the interleaving window
                IndexFs.writeUtf8(counter, (v + 1).toString)
              }
              done += 1
            } catch {
              case _: IllegalStateException => Thread.sleep(2) // contended: retry
            }
          }
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    pool.foreach(_.start()); pool.foreach(_.join())
    assert(errs.isEmpty, errs.toString)
    assert(IndexFs.readUtf8(counter).trim.toLong == threads.toLong * perThread,
      "lost update — the lease did not mutually exclude")
  }

  test("index-status CLI reads the health view without mutating anything") {
    val dir = s"${tmpDir("lease_status")}/idx"
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    Similarity.ivfBuild(emb, "vec_id", "embedding", 4, dir)
    Similarity.ivfDelete(spark, dir, Seq(1L, 2L).toDF("vec_id"), "vec_id")
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      graft.cli.GraftCli.run(spark, List("index-status", dir))
    }
    val text = out.toString("UTF-8")
    assert(text.contains("layout: ivf"), text)
    assert(text.contains("tombstones: 2"), text)
    assert(text.contains("lease: free"), text)
    // reading status left the index untouched
    assert(spark.read.parquet(s"$dir/tombstones").count() == 2)
    assert(spark.read.parquet(s"$dir/cells").count() == emb.count())
  }

  test("post-acquire verify: a rival winning the check-then-write window is detected, exactly one writer proceeds") {
    // object stores degrade create-exclusive to check-then-write, so two
    // writers can BOTH believe they created the marker. The post-acquire
    // verify re-reads the stored content: whichever token survived owns
    // the lease; the other must fail loudly WITHOUT deleting the winner's
    // marker. The hook injects the rival's overwrite into the exact window.
    val dir = s"${tmpDir("lease_verify")}/idx"
    val marker = IndexLease.leasePath(dir)
    val rival = "rival@objectstore/thread-11/acq-999"
    IndexLease.postCreateHook = p => IndexFs.writeUtf8(p, rival)
    try {
      val e = intercept[IllegalStateException] {
        IndexLease.withLease(dir) { fail("loser must not run its op") }
      }
      assert(e.getMessage.contains("post-acquire verify"), e.getMessage)
      assert(e.getMessage.contains(rival), e.getMessage)
      // the loser did NOT delete the winner's live lease
      assert(IndexFs.exists(marker), "loser deleted the winner's lease")
      assert(IndexFs.readUtf8(marker) == rival)
    } finally IndexLease.postCreateHook = _ => ()
    IndexFs.deleteFile(marker)
    // with the window closed the same acquire verifies and proceeds
    assert(IndexLease.withLease(dir) { 7 } == 7)
    assert(!IndexFs.exists(marker))
  }

  test("renewal is owner-checked: a heartbeat never rewrites a taken-over marker") {
    // a writer that hangs past the stale window and is taken over must not
    // have its heartbeat clobber the NEW holder's marker — the renewal
    // reads first and rewrites only its own token
    val dir = s"${tmpDir("lease_renew")}/idx"
    val marker = IndexLease.leasePath(dir)
    val prev = sys.props.get("graft.lease.stale.ms")
    sys.props("graft.lease.stale.ms") = "600" // heartbeat every 200 ms
    try {
      IndexLease.withLease(dir) {
        IndexFs.writeUtf8(marker, "usurper@elsewhere/thread-9/acq-1")
        Thread.sleep(900) // several heartbeat periods
        assert(IndexFs.readUtf8(marker) == "usurper@elsewhere/thread-9/acq-1",
          "old holder's heartbeat overwrote the new holder's lease")
      }
      // release is owner-checked too — the usurper's marker survives
      assert(IndexFs.readUtf8(marker) == "usurper@elsewhere/thread-9/acq-1")
    } finally prev match {
      case Some(v) => sys.props("graft.lease.stale.ms") = v
      case None => sys.props.remove("graft.lease.stale.ms")
    }
    IndexFs.deleteFile(marker)
  }

  test("a malformed or non-positive stale setting fails loudly, naming the setting") {
    val dir = s"${tmpDir("lease_cfg")}/idx"
    val prev = sys.props.get("graft.lease.stale.ms")
    try {
      sys.props("graft.lease.stale.ms") = "banana"
      val e = intercept[IllegalArgumentException] {
        IndexLease.withLease(dir) { fail("must not run") }
      }
      assert(e.getMessage.contains("graft.lease.stale.ms"), e.getMessage)
      assert(e.getMessage.contains("banana"), e.getMessage)
      sys.props("graft.lease.stale.ms") = "-5"
      val e2 = intercept[IllegalArgumentException] {
        IndexLease.withLease(dir) { fail("must not run") }
      }
      assert(e2.getMessage.contains("positive"), e2.getMessage)
      // a valid value re-parses (the cache keys on the raw string)
      sys.props("graft.lease.stale.ms") = "60000"
      assert(IndexLease.withLease(dir) { 3 } == 3)
    } finally prev match {
      case Some(v) => sys.props("graft.lease.stale.ms") = v
      case None => sys.props.remove("graft.lease.stale.ms")
    }
  }

  test("leases survive whole-dir swaps (sibling marker): compact under lease leaves no marker behind") {
    val dir = s"${tmpDir("lease_swap")}/idx"
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    Similarity.ivfBuild(emb, "vec_id", "embedding", 4, dir)
    Similarity.ivfCompact(spark, dir) // acquires + releases internally
    assert(!IndexFs.exists(IndexLease.leasePath(dir)))
    assert(spark.read.parquet(
      s"${IncrementalDedup.readRoot(dir)}/cells").count() == emb.count())
  }
}
