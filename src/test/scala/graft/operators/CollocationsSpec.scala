package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed lift on a fixed corpus") {
    // 10 docs "new york", 5 docs "new deal": N = 30 tokens,
    // c(new)=15, c(york)=10, c(deal)=5
    // lift(new york) = 30*10/(15*10) = 2.0; lift(new deal) = 30*5/(15*5) = 2.0
    val docs = (Seq.fill(10)("new york") ++ Seq.fill(5)("new deal")).toDF("text")
    val got = Collocations.topBigrams(docs, col("text"), minCount = 5, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(5)))
    assert(got.toSeq == Seq(("new", "deal", 5L, 2.0), ("new", "york", 10L, 2.0)))
  }

  test("minCount floor drops rare pairs; k caps the output totally") {
    val docs = (Seq.fill(6)("a b") ++ Seq.fill(3)("c d") ++ Seq.fill(7)("e f"))
      .toDF("text")
    val got = Collocations.topBigrams(docs, col("text"), minCount = 5, k = 1)
      .collect()
    assert(got.length == 1)
    // c-d (count 3) is below the floor; the single slot goes to the higher
    // lift of the two survivors: N=32, lift(a b)=32*6/36=5.33, lift(e f)=32*7/49=4.57
    assert(got.head.getString(0) == "a" && got.head.getString(1) == "b")
  }

  test("single-token and empty docs contribute no bigrams") {
    val docs = Seq("solo", "", "x y x y x y x y x y").toDF("text")
    val got = Collocations.topBigrams(docs, col("text"), minCount = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSet == Set(("x", "y", 5L), ("y", "x", 4L)))
  }

  test("case folding merges variants before counting") {
    val docs = Seq.fill(5)("New York").toDF("text")
    val got = Collocations.topBigrams(docs, col("text"), minCount = 5, k = 5)
      .collect()
    assert(got.length == 1 && got.head.getString(0) == "new")
  }
}
