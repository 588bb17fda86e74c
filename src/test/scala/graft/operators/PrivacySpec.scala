package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("pseudonymize is deterministic, salt-sensitive, and lower-hex sha256") {
    val df = Seq(42L, 42L, 7L).toDF("id")
    val got = df.select(
      Privacy.pseudonymize(col("id"), "s1").as("a"),
      Privacy.pseudonymize(col("id"), "s1").as("b"),
      Privacy.pseudonymize(col("id"), "s2").as("c")).collect()
    got.foreach { r =>
      assert(r.getString(0) == r.getString(1), "same salt+value must agree")
      assert(r.getString(0) != r.getString(2), "different salt must diverge")
      assert(r.getString(0).matches("[0-9a-f]{64}"))
    }
    // referential integrity: equal inputs map to equal pseudonyms
    assert(got(0).getString(0) == got(1).getString(0))
    assert(got(0).getString(0) != got(2).getString(0))
  }

  test("kAnonymityAudit flags groups below k") {
    val df = Seq(
      ("en", "a"), ("en", "a"), ("en", "a"),
      ("de", "b"), ("de", "b"),
      ("zh", "c")).toDF("lang", "src")
    val got = Privacy.kAnonymityAudit(df, Seq(col("lang"), col("src")), k = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map("en" -> ((3L, true)), "de" -> ((2L, false)), "zh" -> ((1L, false))))
  }

  test("suppressRare drops exactly the failing combinations, null-safely") {
    val df = Seq(
      (1L, Some("en"), "a"), (2L, Some("en"), "a"), (3L, Some("en"), "a"),
      (4L, None, "b"), (5L, Some("zh"), "c")).toDF("id", "lang", "src")
    val kept = Privacy.suppressRare(df, Seq("lang", "src"), k = 3)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L), "rare groups (incl. the null one) must go")
  }
}
