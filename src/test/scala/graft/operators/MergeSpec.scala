package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String, Long)*) =
    rows.toDF("id", "text", "v")

  test("upsert: updated keys replaced, new keys inserted, others carried") {
    val base = snap((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
    val updates = snap((2L, "B", 2L), (4L, "d", 2L))
    val got = Merge.upsert(base, updates, "id").orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))
  }

  test("upsertLatest: highest version wins regardless of batch order") {
    val base = snap((1L, "a", 1L))
    val updates = snap((1L, "old", 2L), (1L, "newest", 5L), (1L, "mid", 3L))
    val got = Merge.upsertLatest(base, updates, "id", $"v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "newest")))
    // replay in any order converges to the same snapshot
    val replay = Merge.upsertLatest(base, updates.orderBy($"v".desc), "id", $"v")
    assert(Merge.diff(got.toDF("id", "text").withColumn("v", lit(5L)),
      replay, "id").isEmpty)
  }

  test("applyDeletes removes exactly the tombstoned keys") {
    val base = snap((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
    val got = Merge.applyDeletes(base, Seq(2L).toDF("id"), "id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }

  test("diff classifies inserted, deleted, changed; unchanged keys absent") {
    val old = snap((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L), (5L, "e", 1L))
    val now = snap((1L, "a", 1L), (2L, "B!", 1L), (4L, "d", 1L), (5L, "e", 1L))
    val got = Merge.diff(old, now, "id").orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((2L, "changed"), (3L, "deleted"), (4L, "inserted")))
  }

  test("diff distinguishes null from value in non-key columns") {
    val old = Seq((1L, Option("x")), (2L, Option.empty[String])).toDF("id", "text")
    val now = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "text")
    val got = Merge.diff(old, now, "id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "changed")))
  }

  test("roundtrip: applying diff-derived changes reproduces the new snapshot") {
    val old = snap((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
    val now = snap((2L, "B", 2L), (3L, "c", 1L), (9L, "i", 1L))
    val d = Merge.diff(old, now, "id")
    val upserts = now.join(d.where($"change" isin ("inserted", "changed")), Seq("id"))
      .drop("change")
    val deletes = d.where($"change" === "deleted").select($"id")
    val rebuilt = Merge.applyDeletes(Merge.upsert(old, upserts, "id"), deletes, "id")
    assert(Merge.diff(rebuilt, now, "id").isEmpty)
  }
}
