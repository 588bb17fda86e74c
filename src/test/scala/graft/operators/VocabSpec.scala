package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("build ranks by frequency with token tiebreak; ids start at 1") {
    val docs = Seq((1L, "b b b a a c"), (2L, "a d")).toDF("doc_id", "text")
    // counts: a=3, b=3, c=1, d=1 -> tie-break by token string
    val got = Vocab.build(docs, col("text"), size = 3)
      .orderBy("id").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 1L), ("b", 2L), ("c", 3L)))
  }

  test("encode preserves token order, routes OOV to 0, counts both") {
    val docs = Seq((1L, "b a zz a")).toDF("doc_id", "text")
    val vocab = Seq(("a", 1L), ("b", 2L)).toDF("token", "id")
    val row = Vocab.encode(docs, col("doc_id"), col("text"), vocab).collect().head
    assert(row.getSeq[Long](row.fieldIndex("ids")) == Seq(2L, 1L, 0L, 1L))
    assert(row.getLong(row.fieldIndex("n_tokens")) == 4L)
    assert(row.getLong(row.fieldIndex("n_oov")) == 1L)
  }

  test("build+encode is repartition-deterministic") {
    val docs = (0L until 300L)
      .map(i => (i, s"w${i % 7} w${i % 3} w${i % 11}")).toDF("doc_id", "text")
    val a = Vocab.encode(docs, col("doc_id"), col("text"),
      Vocab.build(docs, col("text"), 10))
    val b = Vocab.encode(docs.repartition(13), col("doc_id"), col("text"),
      Vocab.build(docs.repartition(7), col("text"), 10))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
