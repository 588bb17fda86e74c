package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("bernoulli membership is a pure function of the key — repartition-proof") {
    val base = spark.range(0, 5000).toDF("id")
    val a = base.where(Sampling.bernoulli($"id", 0.3)).collect().map(_.getLong(0)).toSet
    val b = base.repartition(17).where(Sampling.bernoulli($"id", 0.3))
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    // fraction lands near the target on 5000 keys
    assert(math.abs(a.size / 5000.0 - 0.3) < 0.05, s"got ${a.size}")
  }

  test("bernoulli is monotone in the fraction (nested samples)") {
    val base = spark.range(0, 5000).toDF("id")
    val small = base.where(Sampling.bernoulli($"id", 0.1)).collect().map(_.getLong(0)).toSet
    val big = base.where(Sampling.bernoulli($"id", 0.5)).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big), "the 10% sample must be inside the 50% sample")
  }

  test("sample-then-join equals join-then-sample on a shared key") {
    val left = spark.range(0, 1000).select($"id", pmod($"id" * 37, lit(100)).as("x"))
    val right = spark.range(0, 1000).select($"id", pmod($"id" * 53, lit(100)).as("y"))
    val sampleJoin = left.where(Sampling.bernoulli($"id", 0.2))
      .join(right.where(Sampling.bernoulli($"id", 0.2)), "id")
    val joinSample = left.join(right, "id").where(Sampling.bernoulli($"id", 0.2))
    assert(sampleJoin.exceptAll(joinSample).isEmpty && joinSample.exceptAll(sampleJoin).isEmpty)
  }

  test("toShares hits the target mixture without upsampling any group") {
    // groups deliberately far from the target mixture
    val df = spark.range(0, 8000).select($"id",
      when(pmod($"id", lit(10)) < 7, "big")
        .when(pmod($"id", lit(10)) < 9, "mid").otherwise("rare").as("g"))
    val shares = Seq("big" -> 0.5, "mid" -> 0.25, "rare" -> 0.25)
    val got = Sampling.toShares(df, $"g", $"id", shares)
    val counts = got.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    // rare (800 rows) is the binding group: budget = 800/0.25 = 3200
    shares.foreach { case (g, s) =>
      assert(math.abs(counts(g) / total - s) < 0.03, s"$g: ${counts(g)}/$total vs $s")
    }
    // no upsampling: the binding group keeps (nearly) everything, none exceed
    assert(counts("rare") <= 800 && counts("rare") > 700)
    // membership is keyed — a second run over different partitioning agrees
    val again = Sampling.toShares(df.repartition(13), $"g", $"id", shares)
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
  }

  test("toShares drops groups without a configured share") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "junk")).toDF("id", "g")
    val got = Sampling.toShares(df, $"g", $"id", Seq("a" -> 1.0))
    assert(got.select("g").distinct().collect().map(_.getString(0)).toSeq == Seq("a"))
  }

  test("temperatureBalance keeps the smallest group whole, pulls big groups toward sqrt") {
    val df = spark.range(0, 4000).select($"id",
        when($"id" < 100, "rare").when($"id" < 1000, "mid").otherwise("big").as("g"))
    val got = Sampling.temperatureBalance(df, $"g", $"id").cache()
    val counts = got.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rates: rare = 1.0 (kept whole), mid = sqrt(100/900) = 1/3,
    // big = sqrt(100/3000) ~ 0.1826 -> expected sizes 100 / 300 / ~548
    assert(counts("rare") == 100L, "the binding group must keep every row")
    assert(math.abs(counts("mid") - 300L) < 60, counts.toString)
    assert(math.abs(counts("big") - 548L) < 90, counts.toString)
    // membership is a pure function of the key: repartition-proof
    val again = Sampling.temperatureBalance(df.repartition(13), $"g", $"id")
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
    got.unpersist(blocking = false)
  }

  test("perGroup returns exactly k per group (fewer for small groups), deterministically") {
    val df = spark.range(0, 900)
      .select($"id", (pmod($"id", lit(3))).cast("string").as("g"))
      .union(Seq((9000L, "tiny"), (9001L, "tiny")).toDF("id", "g"))
    val got = Sampling.perGroup(df, $"g", $"id", k = 7)
    val counts = got.groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("0" -> 7L, "1" -> 7L, "2" -> 7L, "tiny" -> 2L), counts.toString)
    // deterministic across partitionings
    val again = Sampling.perGroup(df.repartition(13), $"g", $"id", k = 7)
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
  }

  test("toTokenBudgets meets token budgets; over-budget groups keep everything") {
    // group a: 3000 rows x 10 tokens = 30k mass, budget 6k -> rate 0.2
    // group b: 100 rows x 10 tokens = 1k mass, budget 50k -> keep all
    // group c: unlisted -> dropped
    val df = ((1 to 3000).map(i => (s"a$i", "a", 10L)) ++
      (1 to 100).map(i => (s"b$i", "b", 10L)) ++
      (1 to 50).map(i => (s"c$i", "c", 10L))).toDF("id", "g", "w")
    val got = Sampling.toTokenBudgets(df, $"g", $"id", $"w",
      Seq("a" -> 6000L, "b" -> 50000L))
    val byG = got.groupBy("g").agg(count(lit(1)).as("n"), sum($"w").as("toks"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!byG.contains("c"))
    assert(byG("b") == (100L, 1000L)) // rate 1 branch: everything survives
    val (nA, tokA) = byG("a")
    // expected mass 6000 +- sampling noise on 3000 keys
    assert(math.abs(tokA - 6000.0) / 6000.0 < 0.15, s"token mass $tokA")
    assert(nA < 3000)
    // membership is a pure function of the key: repartition-proof
    val again = Sampling.toTokenBudgets(df.repartition(17), $"g", $"id", $"w",
      Seq("a" -> 6000L, "b" -> 50000L))
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
    // and consistent across recipes that give the group the same rate:
    // a kept doc stays kept when OTHER groups' budgets change
    val other = Sampling.toTokenBudgets(df, $"g", $"id", $"w",
      Seq("a" -> 6000L, "b" -> 999L))
    val keptA = got.filter($"g" === "a").select("id").collect().map(_.getString(0)).toSet
    val keptA2 = other.filter($"g" === "a").select("id").collect().map(_.getString(0)).toSet
    assert(keptA == keptA2)
  }

  test("exactTokenBudgets: bucketed decomposition equals the naive per-group prefix") {
    import org.apache.spark.sql.expressions.Window
    // group a binds mid-corpus (incl. zero-weight rows), b keeps everything,
    // c is not in the recipe and must vanish
    val df = ((1 to 3000).map(i => (s"a$i", "a", (i % 7).toLong)) ++
      (1 to 200).map(i => (s"b$i", "b", 10L)) ++
      (1 to 50).map(i => (s"c$i", "c", 10L))).toDF("id", "g", "w")
    val budgets = Seq("a" -> 4000L, "b" -> 50000L)
    val got = Sampling.exactTokenBudgets(df, $"g", $"id", $"w", budgets)

    // naive reference: one running-sum window over the WHOLE group — the
    // formulation the bucketed operator must match row-for-row
    val wnd = Window.partitionBy($"g")
      .orderBy(md5($"id".cast("string")), $"id".cast("string"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = df.join(budgets.toDF("g", "budget"), "g")
      .withColumn("cumb", coalesce(sum($"w").over(wnd), lit(0L)))
      .where($"cumb" < $"budget").select("id", "g", "w")
    val gotSel = got.select("id", "g", "w")
    assert(gotSel.exceptAll(ref).isEmpty && ref.exceptAll(gotSel).isEmpty)

    // exact-prefix guarantee: admitted mass never exceeds budget + one doc
    val massA = got.where($"g" === "a").agg(sum($"w")).head().getLong(0)
    assert(massA <= 4000L + 6L, s"mass $massA")
    assert(got.where($"g" === "b").count() == 200) // under-budget: keep all
    assert(got.where($"g" === "c").count() == 0) // not in the recipe
    // membership is a pure function of the data — repartition-proof
    val again = Sampling.exactTokenBudgets(df.repartition(17), $"g", $"id", $"w", budgets)
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
    // zero budget admits nothing (strict-< prefix rule is total)
    assert(Sampling.exactTokenBudgets(df, $"g", $"id", $"w", Seq("a" -> 0L)).count() == 0)
  }

  test("mixFeasibility: every status line, exact arithmetic, both audit directions") {
    val df = Seq(
      ("a", 10L), ("a", 20L), // 2 docs, 30 tokens
      ("b", 100L),            // 1 doc, 100 tokens
      ("c", 5L), ("c", 5L)    // 2 docs, 10 tokens
    ).toDF("g", "w")
    val got = Sampling.mixFeasibility(df, $"g", $"w",
      Seq("a" -> 15L, "b" -> 200L, "c" -> 10L, "z" -> 7L))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a") // budget under supply: downsample at rate 1/2
    assert(a.getAs[Long]("docs_available") == 2L
      && a.getAs[Long]("tokens_available") == 30L)
    assert(a.getAs[Double]("keep_rate") == 0.5 && a.getAs[Double]("epochs") == 0.5)
    assert(a.getAs[Long]("deficit_tokens") == 0L
      && a.getAs[Long]("surplus_tokens") == 15L)
    assert(a.getAs[String]("status") == "downsample")
    val b = got("b") // budget over supply: the data-constrained regime
    assert(b.getAs[Double]("keep_rate") == 1.0 && b.getAs[Double]("epochs") == 2.0)
    assert(b.getAs[Long]("deficit_tokens") == 100L
      && b.getAs[String]("status") == "repeat")
    val c = got("c")
    assert(c.getAs[String]("status") == "exact" && c.getAs[Double]("epochs") == 1.0
      && c.getAs[Long]("deficit_tokens") == 0L
      && c.getAs[Long]("surplus_tokens") == 0L)
    val z = got("z") // budgeted group absent from the corpus: audit row, not a silent zero-sample
    assert(z.getAs[String]("status") == "missing"
      && z.getAs[Long]("docs_available") == 0L
      && z.isNullAt(z.fieldIndex("keep_rate"))
      && z.isNullAt(z.fieldIndex("epochs"))
      && z.getAs[Long]("deficit_tokens") == 7L)
    // corpus group the recipe drops: all of its mass is surplus
    val got2 = Sampling.mixFeasibility(df, $"g", $"w", Seq("a" -> 15L))
      .collect().map(r => r.getString(0) -> r).toMap
    val u = got2("b")
    assert(u.getAs[String]("status") == "unbudgeted"
      && u.getAs[Long]("surplus_tokens") == 100L
      && u.isNullAt(u.fieldIndex("epochs"))
      && u.getAs[Long]("deficit_tokens") == 0L)
    // the forecast's keep_rate IS toTokenBudgets' sampling rate: the rate
    // column of the report and the sampler must never disagree
    assert(got.size == 4 && got2.size == 3)
  }

  test("repeatToBudget: k full epochs + exact remainder prefix; degenerates to exactTokenBudgets") {
    val df = (1L to 5L).map(i => ("a", i, 10L)).toDF("g", "id", "w")
    // T = 50, B = 125: k = 2 full epochs, remainder 25 admits the 3-doc
    // md5 prefix (cum 0/10/20 < 25)
    val got = Sampling.repeatToBudget(df, $"g", $"id", $"w", Seq("a" -> 125L))
    val byEpoch = got.groupBy($"epoch").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byEpoch == Map(0L -> 5L, 1L -> 5L, 2L -> 3L))
    // emitted mass is exactly determined: k*T + the strict-< prefix
    assert(got.agg(sum($"w")).head().getLong(0) == 130L)
    // the partial epoch IS exactTokenBudgets at the remainder budget
    val prefix = Sampling.exactTokenBudgets(df, $"g", $"id", $"w", Seq("a" -> 25L))
      .select($"id").as[Long].collect().toSet
    assert(got.where($"epoch" === 2L).select($"id").as[Long].collect().toSet == prefix)
    // budget <= mass: one definition of "admit under a budget" across both
    // regimes — identical membership, all of it epoch 0
    val small = Sampling.repeatToBudget(df, $"g", $"id", $"w", Seq("a" -> 35L))
    assert(small.select($"epoch").distinct().as[Long].collect().toSeq == Seq(0L))
    assert(small.select($"id").as[Long].collect().toSet ==
      Sampling.exactTokenBudgets(df, $"g", $"id", $"w", Seq("a" -> 35L))
        .select($"id").as[Long].collect().toSet)
    // zero budget emits nothing; a recipe group absent from the corpus
    // emits nothing (mixFeasibility's 'missing' row is the audit signal)
    assert(Sampling.repeatToBudget(df, $"g", $"id", $"w", Seq("a" -> 0L)).count() == 0)
    assert(Sampling.repeatToBudget(df, $"g", $"id", $"w", Seq("nope" -> 100L)).count() == 0)
    // multiplicity is a pure function of the data — repartition-proof
    val again = Sampling.repeatToBudget(
      df.repartition(7), $"g", $"id", $"w", Seq("a" -> 125L))
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
  }
}
