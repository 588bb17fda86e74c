package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) =
    ParagraphDedup.dedupParagraphs(docs.toDF("id", "text"), $"id", $"text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("first document keeps a shared paragraph; later copies drop; order is preserved") {
    val got = run(Seq(
      1L -> "alpha\n\nshared one\n\nbeta",
      2L -> "shared one\n\ngamma\n\nshared one",
      3L -> "delta\n\nshared one"))
    assert(got(0) == (1L, "alpha\n\nshared one\n\nbeta", 3L, 3L))
    // doc 2 loses both copies (cross-doc AND its own internal repeat)
    assert(got(1) == (2L, "gamma", 3L, 1L))
    assert(got(2) == (3L, "delta", 2L, 1L))
  }

  test("within-doc position decides first-wins when the doc id ties") {
    val got = run(Seq(1L -> "x\n\nx\n\ny"))
    assert(got(0) == (1L, "x\n\ny", 3L, 2L))
  }

  test("a doc made entirely of already-seen paragraphs stays in the corpus with empty text") {
    val got = run(Seq(1L -> "a\n\nb", 2L -> "b\n\na"))
    assert(got(0) == (1L, "a\n\nb", 2L, 2L))
    assert(got(1) == (2L, "", 2L, 0L))
  }

  test("empty paragraphs from doubled separators are structure, not content") {
    val got = run(Seq(1L -> "a\n\n\n\nb", 2L -> "\n\nc"))
    assert(got(0) == (1L, "a\n\nb", 2L, 2L))
    assert(got(1) == (2L, "c", 1L, 1L))
  }

  test("survivor set is repartition-invariant") {
    val docs = (1L to 200L).map(i => (i, s"p${i % 17}\n\np${i % 29}\n\nu$i"))
    val a = run(docs)
    val b = ParagraphDedup
      .dedupParagraphs(docs.toDF("id", "text").repartition(13), $"id", $"text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(a.toSeq == b.toSeq)
    // every distinct paragraph survives exactly once corpus-wide
    val kept = a.flatMap(_._2.split("\n\n").filter(_.nonEmpty))
    assert(kept.length == kept.distinct.length)
    assert(kept.toSet == docs.flatMap(_._2.split("\n\n")).toSet)
  }
}
