package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrainingOrderSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 300L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
  private val sources = Seq("s0", "s1", "s2")

  test("round-robin: consecutive occupied positions never share a source") {
    val rows = TrainingOrder.interleave(docs, $"src", $"id", sources)
      .select("src", "global_pos").as[(String, Long)].collect()
      .sortBy(_._2)
    rows.sliding(2).foreach { case Array((sa, _), (sb, _)) =>
      assert(sa != sb)
    case _ => }
    // equal-sized sources -> dense positions 0..299, a perfect permutation
    assert(rows.map(_._2).toSeq == (0L until 300L))
  }

  test("positions are collision-free and epoch changes the permutation") {
    val e0 = TrainingOrder.interleave(docs, $"src", $"id", sources)
      .select("id", "global_pos").as[(Long, Long)].collect().toMap
    val e1 = TrainingOrder.interleave(docs, $"src", $"id", sources, epoch = 1)
      .select("id", "global_pos").as[(Long, Long)].collect().toMap
    assert(e0.values.toSeq.distinct.size == 300)
    assert(e0 != e1)
    // same epoch reproduces exactly, under any partitioning
    val again = TrainingOrder.interleave(docs.repartition(13), $"src", $"id", sources)
      .select("id", "global_pos").as[(Long, Long)].collect().toMap
    assert(again == e0)
  }

  test("unequal sources: order property holds, positions stay sparse but sorted-safe") {
    val skew = ((1L to 100L).map(i => (i, "big")) ++ (101L to 110L).map(i => (i, "small")))
      .toDF("id", "src")
    val rows = TrainingOrder.interleave(skew, $"src", $"id", Seq("big", "small"))
      .select("src", "global_pos").as[(String, Long)].collect().sortBy(_._2)
    // while both sources last, strict alternation
    rows.take(20).sliding(2).foreach { case Array((a, _), (b, _)) => assert(a != b)
    case _ => }
    // collision-free always
    assert(rows.map(_._2).distinct.length == 110)
    // undeclared sources are dropped
    val dropped = TrainingOrder.interleave(skew, $"src", $"id", Seq("big"))
    assert(dropped.count() == 100)
  }

  test("writeShards materializes the epoch order: union exact, assignment pure, replay sorted") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    val back = TrainingOrder.writeShards(docs, $"id", out, nShards = 8)
    // nothing lost, nothing invented
    assert(back.count() == 300)
    assert(back.select("id").as[Long].collect().toSet == (1L to 300L).toSet)
    // on-disk shard dirs match the pure assignment column exactly
    val diskVsCol = back.withColumn("expect", TrainingOrder.shard($"id", 0, 8))
      .where($"shard" =!= $"expect").count()
    assert(diskVsCol == 0)
    val shardDirs = new java.io.File(out).list().count(_.startsWith("shard="))
    assert(shardDirs >= 2 && shardDirs <= 8, s"dirs=$shardDirs")
    // a loader streaming (shard, file, row) replays the global md5 order:
    // shard boundaries are contiguous key ranges, rows sorted within files
    val replay = back.orderBy($"shard", $"skey").select("skey").as[String].collect()
    assert(replay.toSeq == replay.sorted.toSeq)
    // rerun under different input partitioning is identical (pure function
    // of (epoch, id)) — snapshot the first run's assignments BEFORE the
    // overwrite invalidates `back`'s cached file listing
    val firstRun = back.select("id", "shard").as[(Long, Int)].collect().toSet
    val again = TrainingOrder.writeShards(
      docs.repartition(13), $"id", out, nShards = 8)
    assert(again.select("id", "shard").as[(Long, Int)].collect().toSet == firstRun)
  }

  test("writeMixtureShards: exact-balanced rank ranges that replay the mixture order") {
    val out = java.nio.file.Files.createTempDirectory("mixshards").toString
    val ordered = TrainingOrder.interleave(docs, $"src", $"id", sources)
    val back = TrainingOrder.writeMixtureShards(ordered, $"global_pos", out, 8)
    assert(back.count() == 300)
    assert(back.select("id").as[Long].collect().toSet == (1L to 300L).toSet)
    // shard ids are the engine-independent rank arithmetic
    val got = back.select("global_pos", "shard").as[(Long, Int)].collect().sortBy(_._1)
    val expect = got.map(_._1).zipWithIndex.map { case (p, r) => (p, (r.toLong * 8 / 300).toInt) }
    assert(got.toSeq == expect.toSeq)
    // exact balance: rank-range shards differ by at most one row
    val sizes = got.groupBy(_._2).values.map(_.length)
    assert(sizes.max - sizes.min <= 1, s"sizes=$sizes")
    // the loader contract itself: streaming (shard dir, file name, row)
    // order replays global_pos ascending — checked at FILE granularity,
    // one file read at a time in listing order
    val shardDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(
        f => f.getName.stripPrefix("shard=").toInt)
    assert(shardDirs.length == 8)
    val replayed = shardDirs.flatMap { dir =>
      dir.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .flatMap { f =>
          spark.read.parquet(f.toString).select("global_pos").as[Long].collect()
        }
    }
    assert(replayed.toSeq == replayed.sorted.toSeq)
    assert(replayed.length == 300)
    // and the mixture property survives materialization: consecutive rows
    // of the replay never share a source while every source lasts
    val bySrc = back.select("global_pos", "src").as[(Long, String)].collect()
      .sortBy(_._1).map(_._2)
    bySrc.sliding(2).foreach { case Array(a, b) => assert(a != b) case _ => }
    // deterministic under any input partitioning (snapshot before the
    // overwrite invalidates `back`'s cached file listing)
    val firstRun = back.select("id", "shard").as[(Long, Int)].collect().toSet
    val again = TrainingOrder.writeMixtureShards(
      ordered.repartition(13), $"global_pos", out, 8)
    assert(again.select("id", "shard").as[(Long, Int)].collect().toSet == firstRun)
  }

  test("shuffleKey ordering mixes sources without any window") {
    val ordered = docs.withColumn("k", TrainingOrder.shuffleKey($"id"))
      .orderBy("k").select("src").as[String].collect()
    // no same-source run longer than 8 in 300 hash-ordered rows
    val maxRun = ordered.foldLeft((0, "", 0)) { case ((best, prev, run), s) =>
      val r = if (s == prev) run + 1 else 1
      (math.max(best, r), s, r)
    }._1
    assert(maxRun <= 8, s"max same-source run $maxRun")
  }

  test("repeatToBudget composes with interleave via the composite (id, epoch) key") {
    val df = ((1L to 8L).map(i => ("a", i, 10L)) ++
      (1L to 3L).map(i => ("b", i + 100L, 10L))).toDF("src", "id", "w")
    // a: T = 80, budget 160 -> exactly 2 full epochs (16 copies);
    // b: T = 30, budget 30 -> 1 full epoch (3 copies)
    val rep = Sampling.repeatToBudget(df, $"src", $"id", $"w",
      Seq("a" -> 160L, "b" -> 30L))
    assert(rep.count() == 19)
    // the composite key restores uniqueness, so every COPY gets its own
    // round-robin position — this is the documented downstream contract
    val ordered = TrainingOrder.interleave(rep, $"src",
      concat_ws(":", $"id", $"epoch"), Seq("a", "b"))
    assert(ordered.count() == 19
      && ordered.select("global_pos").distinct().count() == 19)
    // strict alternation while both sources last (b's 3 copies occupy the
    // first three odd positions)
    val seq = ordered.select($"global_pos", $"src").as[(Long, String)]
      .collect().sortBy(_._1).map(_._2)
    assert(seq.take(6).toSeq == Seq("a", "b", "a", "b", "a", "b"), seq.mkString)
    // the epoch component SALTS the order: the two full epochs of source a
    // hold the same ids but replay them in different deterministic orders
    val byEpoch = ordered.where($"src" === "a")
      .select($"epoch", $"global_pos", $"id").as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(byEpoch(0L).toSet == byEpoch(1L).toSet, byEpoch.toString)
    assert(byEpoch(0L) != byEpoch(1L),
      "epoch copies must not replay one sequence twice")
  }

  test("readShardRange: prefix reads replay the mixture order; tampered release fails loudly") {
    val ordered = TrainingOrder.interleave(docs, $"src", $"id", sources)
      .localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("read_range").toString + "/ds"
    TrainingOrder.writeMixtureShards(ordered, $"global_pos", dir, 4)
    graft.sinks.DatasetManifest.write(spark, dir)
    // full range = the exact global sequence; a sub-range = a strict
    // contiguous prefix of it (never a sample)
    val full = TrainingOrder.readShardRange(spark, dir, 0, 3)
      .select($"global_pos").as[Long].collect().toSeq
    assert(full == ordered.select($"global_pos").as[Long]
      .collect().sorted.toSeq)
    val prefix = TrainingOrder.readShardRange(spark, dir, 0, 0)
      .select($"global_pos").as[Long].collect().toSeq
    assert(prefix.nonEmpty && prefix == full.take(prefix.length))
    // explicit opt-out skips the manifest pass (the caller owns the risk);
    // the full tier also passes a clean release
    assert(TrainingOrder.readShardRange(spark, dir, 1, 3,
      verify = "off").count() > 0)
    assert(TrainingOrder.readShardRange(spark, dir, 0, 0,
      verify = "full").count() > 0)
    // a torn release fails at the manifest, before any training step
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/shard=0"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.write(part, Array[Byte](0x7f),
      java.nio.file.StandardOpenOption.APPEND)
    java.nio.file.Files.deleteIfExists(
      part.getParent.resolve("." + part.getFileName.toString + ".crc"))
    val e = intercept[IllegalArgumentException] {
      TrainingOrder.readShardRange(spark, dir, 0, 3)
    }
    assert(e.getMessage.contains("manifest"), e.getMessage)
  }

  test("sequential shard read: exact replay order with NO exchange in the plan") {
    val ordered = TrainingOrder.interleave(docs, $"src", $"id", sources)
      .localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("seq_read").toString + "/ds"
    TrainingOrder.writeMixtureShards(ordered, $"global_pos", dir, 4)
    graft.sinks.DatasetManifest.write(spark, dir)
    // the loader iterator and the orderBy path agree row-for-row — same
    // data, same order, but the iterator never pays the range shuffle
    val viaSort = TrainingOrder.readShardRange(spark, dir, 0, 3)
      .select($"global_pos").as[Long].collect().toSeq
    val viaSeq = TrainingOrder.shardRangeIterator(spark, dir, 0, 3)
      .map(_.getAs[Long]("global_pos")).toSeq
    assert(viaSeq == viaSort)
    // a sub-range is the same contiguous prefix both ways
    val pfx = TrainingOrder.shardRangeIterator(spark, dir, 0, 1, verify = "off")
      .map(_.getAs[Long]("global_pos")).toSeq
    assert(pfx.nonEmpty && pfx == viaSort.take(pfx.length))
    // plan pin: the per-shard frame carries no Exchange of any kind,
    // while the orderBy path necessarily does
    val seqPlan = TrainingOrder.readShardSequential(spark, dir, 0)
      .queryExecution.executedPlan.toString
    assert(!seqPlan.contains("Exchange"), seqPlan)
    val sortPlan = TrainingOrder.readShardRange(spark, dir, 0, 3, verify = "off")
      .queryExecution.executedPlan.toString
    assert(sortPlan.contains("Exchange"), "contrast lost: orderBy path should shuffle")
    // the manifest gate guards the iterator too
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/shard=0"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.write(part, Array[Byte](0x11),
      java.nio.file.StandardOpenOption.APPEND)
    java.nio.file.Files.deleteIfExists(
      part.getParent.resolve("." + part.getFileName.toString + ".crc"))
    val e = intercept[IllegalArgumentException] {
      TrainingOrder.shardRangeIterator(spark, dir, 0, 3).hasNext
    }
    assert(e.getMessage.contains("manifest"), e.getMessage)
  }

  test("prefetched loader: row-identical to the non-prefetching path, across shard boundaries") {
    val ordered = TrainingOrder.interleave(docs, $"src", $"id", sources)
      .localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("prefetch_read")
      .toString + "/ds"
    // several part files per shard so the read-ahead crosses chunk AND
    // shard boundaries many times
    TrainingOrder.writeMixtureShards(ordered, $"global_pos", dir, 4)
    def seqOf(prefetch: Boolean) =
      TrainingOrder.shardRangeIterator(spark, dir, 0, 3, verify = "off",
          prefetch = prefetch)
        .map(r => (r.getAs[Long]("global_pos"), r.getAs[Long]("id"))).toSeq
    val plain = seqOf(prefetch = false)
    val ahead = seqOf(prefetch = true)
    assert(plain.nonEmpty && ahead == plain,
      "read-ahead must not reorder, drop, or duplicate rows")
    // a sub-range is the same contiguous prefix through the prefetch path
    val pfx = TrainingOrder.shardRangeIterator(spark, dir, 0, 0,
        verify = "off", prefetch = true)
      .map(_.getAs[Long]("global_pos")).toSeq
    assert(pfx.nonEmpty && pfx == plain.take(pfx.length).map(_._1))
    // empty range edge: a shard range with no files is an empty iterator
    assert(!TrainingOrder.shardRangeIterator(spark, dir, 17, 19,
      verify = "off", prefetch = true).hasNext)
  }
}
