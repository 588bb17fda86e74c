package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, window: Int, stride: Int): Seq[(Long, String, Long)] =
    TextPipeline.chunk(Seq((1L, text)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), window, stride)
      .orderBy("chunk_id")
      .collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSeq

  test("chunk: overlapping windows cover every token, last chunk may be short") {
    val text = (1 to 25).map(i => s"w$i").mkString(" ")
    val got = chunksOf(text, window = 10, stride = 5)
    // nChunks = ((25 - 10 + 4) div 5) + 1 = 4
    assert(got.size == 4)
    assert(got.head._2 == (1 to 10).map(i => s"w$i").mkString(" "))
    assert(got(1)._2 == (6 to 15).map(i => s"w$i").mkString(" "))
    assert(got.last._2 == (16 to 25).map(i => s"w$i").mkString(" "))
    assert(got.map(_._3) == Seq(10L, 10L, 10L, 10L))
    // consecutive chunks overlap by window - stride tokens
    val o1 = got.head._2.split(" ").takeRight(5).toSeq
    assert(o1 == got(1)._2.split(" ").take(5).toSeq)
  }

  test("chunk: short and exact-window docs yield exactly one chunk") {
    assert(chunksOf("a b c", 10, 5) == Seq((0L, "a b c", 3L)))
    val exact = (1 to 10).map(i => s"w$i").mkString(" ")
    assert(chunksOf(exact, 10, 5) == Seq((0L, exact, 10L)))
  }

  test("chunk: stride 1 over window 2 is every adjacent pair") {
    val got = chunksOf("a b c d", 2, 1)
    assert(got.map(_._2) == Seq("a b", "b c", "c d"))
  }

  test("chunk: multi-whitespace and surrounding space tokenize like trim+split") {
    val got = chunksOf("  a \t b\n  c  ", 2, 2)
    assert(got.map(_._2) == Seq("a b", "c"))
  }

  test("redactPii: golden replacements, URL before email before IP") {
    val in = "write a@b.io or see https://x.example/u?q=1 at 192.168.0.1 end"
    val out = Seq(in).toDF("t").select(TextPipeline.redactPii(col("t"))).collect().head.getString(0)
    assert(out == "write <EMAIL> or see <URL> at <IP> end")
  }

  test("redactPii: an email-shaped substring inside a URL is covered by the URL span") {
    val in = "go http://x.example/mail?to=a@b.com now"
    val out = Seq(in).toDF("t").select(TextPipeline.redactPii(col("t"))).collect().head.getString(0)
    assert(out == "go <URL> now")
  }

  test("redactPii: version numbers are not IPs (needs 4 octets)") {
    val in = "release 1.2.3 and 1.2.3.4"
    val out = Seq(in).toDF("t").select(TextPipeline.redactPii(col("t"))).collect().head.getString(0)
    assert(out == "release 1.2.3 and <IP>")
  }

  test("repetitionScore: heavily repeated text scores low, unique text scores 1.0") {
    val df = Seq(
      (1L, "a b a b a b"),          // 5 bigrams, 2 distinct -> 0.4
      (2L, "v w x y z"),            // 4 bigrams, all distinct -> 1.0
      (3L, "solo")                  // shorter than n -> null
    ).toDF("doc_id", "text")
    val got = TextPipeline.repetitionScore(df, col("doc_id"), col("text"), n = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq((1L, 5L, Some(0.4)), (2L, 4L, Some(1.0)), (3L, 0L, None)))
  }

  test("contamination: overlap fraction against the benchmark shingle union") {
    val corpus = Seq(
      (1L, "p q r s"),   // bigrams {p q, q r, r s}; {p q, q r} in bench -> 2/3
      (2L, "x y z w"),   // no overlap -> 0.0
      (3L, "p q")        // single bigram, in bench -> 1.0
    ).toDF("doc_id", "text")
    val bench = Seq((10L, "p q r"), (11L, "m n")).toDF("doc_id", "text")
    val got = TextPipeline.contamination(corpus, bench, col("doc_id"), col("text"), n = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 3L, 2.0 / 3.0), (2L, 3L, 0.0), (3L, 1L, 1.0)))
  }

  test("contamination: docs shorter than n tokens score 0 shingles / null ratio " +
      "and short benchmark docs contribute nothing") {
    val corpus = Seq(
      (1L, "a b c"),     // 1 trigram {a b c}, in bench -> 1.0
      (2L, "a b"),       // 2 tokens < n=3 -> 0 shingles, null ratio
      (3L, ""),          // empty -> 0 shingles, null ratio
      (4L, "x y z")      // 1 trigram, NOT in bench ("x y" is too short there) -> 0.0
    ).toDF("doc_id", "text")
    // bench doc 11 is shorter than n: its partial shingle must NOT enter the
    // benchmark set (doc 4's full trigram "x y z" must not match "x y")
    val bench = Seq((10L, "a b c d"), (11L, "x y")).toDF("doc_id", "text")
    val got = TextPipeline.contamination(corpus, bench, col("doc_id"), col("text"), n = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      (1L, 1L, Some(1.0)), (2L, 0L, None), (3L, 0L, None), (4L, 1L, Some(0.0))))
  }

  test("contamination: identical output with broadcast joins disabled (shuffle semi-join regime)") {
    val corpus = (1L to 200L).map(i => (i, s"tok${i % 17} tok${i % 7} tok${i % 5} tok$i"))
      .toDF("doc_id", "text")
    val bench = (1L to 40L).map(i => (1000 + i, s"tok${i % 17} tok${i % 7} tok${i % 5}"))
      .toDF("doc_id", "text")
    def run(): Seq[(Long, Long, Option[Double])] =
      TextPipeline.contamination(corpus, bench, col("doc_id"), col("text"), n = 2)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
        .toSeq
    val broadcastRegime = run()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val shuffleRegime = run()
      assert(shuffleRegime == broadcastRegime)
      assert(broadcastRegime.count(_._3.exists(_ > 0)) > 0) // non-trivial overlap
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("contaminationStateless is row-identical to the join-based contamination") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val bench = docs.where(Layout.hashBucket(col("doc_id")) >= 95)
    val corpus = docs.where(Layout.hashBucket(col("doc_id")) < 95)
    val a = TextPipeline.contamination(corpus, bench, col("doc_id"), col("text"), n = 3)
    val b = TextPipeline.contaminationStateless(corpus, bench, col("doc_id"), col("text"), n = 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() > 0)
    // and on constructed edge cases incl. short/empty docs
    val c2 = Seq((1L, "a b c"), (2L, "a b"), (3L, ""), (4L, "x y z")).toDF("doc_id", "text")
    val b2 = Seq((10L, "a b c d"), (11L, "x y")).toDF("doc_id", "text")
    val a2 = TextPipeline.contamination(c2, b2, col("doc_id"), col("text"), n = 3)
    val s2 = TextPipeline.contaminationStateless(c2, b2, col("doc_id"), col("text"), n = 3)
    assert(a2.exceptAll(s2).isEmpty && s2.exceptAll(a2).isEmpty)
  }

  test("packSequences: exact token bookkeeping, equal to the one-window oracle") {
    val docs = (0L until 300L).map(i => (i, 1L + (i * 31) % 97)).toDF("doc_id", "n")
    val got = TextPipeline.packSequences(docs, col("doc_id"), col("n"), capacity = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.length == 300)
    // seq is the 1..N permutation in (md5(id), id) order; start_token is the
    // exclusive running sum in that order — the single-threaded reference
    val expectOrder = (0L until 300L)
      .sortBy(i => (org.apache.commons.codec.digest.DigestUtils.md5Hex(i.toString), i.toString))
    var cum = 0L
    val ref = expectOrder.zipWithIndex.map { case (id, idx) =>
      val n = 1L + (id * 31) % 97
      val row = (id, idx + 1L, n, cum, cum / 64, (cum + n - 1) / 64, cum % 64)
      cum += n
      row
    }.toSet
    assert(got.toSet == ref)
  }

  test("packSequences is partitioning-proof and bins are gap-free") {
    val docs = (0L until 500L).map(i => (i, 1L + i % 40)).toDF("doc_id", "n")
    val a = TextPipeline.packSequences(docs, col("doc_id"), col("n"), 128L)
    val b = TextPipeline.packSequences(docs.repartition(17), col("doc_id"), col("n"), 128L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // every bin index up to the last is occupied by some doc's span
    val spans = a.select(col("bin_first"), col("bin_last")).collect()
      .flatMap(r => r.getLong(0) to r.getLong(1)).toSet
    assert(spans == (0L to spans.max).toSet, "packing must leave no empty bin")
  }

  test("piiCount counts non-overlapping matches") {
    val in = "a@b.co c@d.org http://e.f 1.2.3.4 5.6.7.8"
    val row = Seq(in).toDF("t").select(
      TextPipeline.piiCount(col("t"), TextPipeline.EmailRe),
      TextPipeline.piiCount(col("t"), TextPipeline.UrlRe),
      TextPipeline.piiCount(col("t"), TextPipeline.Ipv4Re)).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((2L, 1L, 2L)))
  }

  test("dedupLines drops boilerplate lines everywhere, keeps order, keeps empty docs") {
    val docs = Seq(
      (1L, "cookie banner\nunique alpha\nfooter text"),
      (2L, "cookie banner\nunique beta\nfooter text"),
      (3L, "footer text\nunique gamma\ncookie banner"),
      (4L, "cookie banner\nfooter text"), // all boilerplate -> empty
      (5L, "solo line only")).toDF("doc_id", "text")
    val got = TextPipeline.dedupLines(docs, col("doc_id"), col("text"), "\n", minDf = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, "unique alpha", 3L, 2L),
      (2L, "unique beta", 3L, 2L),
      (3L, "unique gamma", 3L, 2L),
      (4L, "", 2L, 2L),
      (5L, "solo line only", 1L, 0L)))
  }

  test("dedupLines counts a line once per doc (within-doc repeats are not df)") {
    // "x" repeats inside doc 1 but appears in only 2 distinct docs: below
    // minDf = 3 it must survive, repeats intact.
    val docs = Seq(
      (1L, "x\nx\na"),
      (2L, "x\nb"),
      (3L, "c")).toDF("doc_id", "text")
    val got = TextPipeline.dedupLines(docs, col("doc_id"), col("text"), "\n", minDf = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "x\nx\na"), (2L, "x\nb"), (3L, "c")))
  }

  private def spansOf(docs: Seq[(Long, String)], k: Int) =
    TextPipeline.duplicateSpans(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), k = k, minDocs = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq

  test("duplicateSpans finds a shared region and merges overlapping windows into one span") {
    val shared = (1 to 6).map(i => s"s$i").mkString(" ") // 6 shared tokens
    val d1 = s"a1 a2 $shared z1 z2"
    val d2 = s"b1 $shared y1 y2 y3"
    // k=4: the shared 6-token run yields 3 dup windows per doc, overlapping
    // into ONE maximal span of exactly the 6 shared tokens.
    val got = spansOf(Seq((1L, d1), (2L, d2)), k = 4)
    // (id, n_tokens, n_windows, n_dup_windows, n_dup_spans, dup_tokens)
    assert(got == Seq((1L, 10L, 7L, 3L, 1L, 6L), (2L, 10L, 7L, 3L, 1L, 6L)))
  }

  test("duplicateSpans: disjoint shared regions stay separate spans; short docs are null-safe") {
    val s1 = "p q r s"
    val s2 = "t u v w"
    val d1 = s"$s1 m1 m2 m3 $s2"       // two disjoint shared 4-gram regions
    val d2 = s"$s1 n1 n2 n3 n4 n5 $s2"
    val tiny = "only two"               // < k tokens: no windows
    val got = spansOf(Seq((1L, d1), (2L, d2), (3L, tiny)), k = 4)
    assert(got(0) == ((1L, 11L, 8L, 2L, 2L, 8L)))
    assert(got(1) == ((2L, 13L, 10L, 2L, 2L, 8L)))
    assert(got(2) == ((3L, 2L, 0L, 0L, 0L, 0L)))
    val frac = TextPipeline.duplicateSpans(Seq((3L, tiny)).toDF("doc_id", "text"),
      col("doc_id"), col("text"), 4, 2).select("dup_frac").collect().head
    assert(frac.isNullAt(0))
  }

  test("duplicateSpans: identical docs are one full-coverage span each") {
    val text = (1 to 9).map(i => s"w$i").mkString(" ")
    val got = spansOf(Seq((1L, text), (2L, text)), k = 4)
    assert(got == Seq((1L, 9L, 6L, 6L, 1L, 9L), (2L, 9L, 6L, 6L, 1L, 9L)))
  }

  private def removedOf(docs: Seq[(Long, String)], k: Int) =
    TextPipeline.removeDuplicateSpans(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), k = k, minDocs = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq

  test("removeDuplicateSpans cuts the shared run from EVERY doc, keeps the rest in order") {
    val shared = (1 to 6).map(i => s"s$i").mkString(" ")
    val d1 = s"a1 a2 $shared z1 z2"
    val d2 = s"b1 $shared y1 y2 y3"
    val got = removedOf(Seq((1L, d1), (2L, d2)), k = 4)
    assert(got == Seq(
      (1L, "a1 a2 z1 z2", 10L, 6L),
      (2L, "b1 y1 y2 y3", 10L, 6L)))
  }

  test("removeDuplicateSpans: fully-duplicated docs come back empty but stay in the corpus") {
    val text = (1 to 9).map(i => s"w$i").mkString(" ")
    val tiny = "only two"
    val got = removedOf(Seq((1L, text), (2L, text), (3L, tiny)), k = 4)
    assert(got == Seq(
      (1L, "", 9L, 9L),
      (2L, "", 9L, 9L),
      (3L, "only two", 2L, 0L)))
  }

  test("extractContent: per-doc line-density extraction, no shuffle in the plan") {
    val docs = Seq(
      (1L, "Nav | Nav | Nav\nA proper paragraph of body prose long enough to keep here.\n(c) footer"),
      (2L, "| --- |\n=== === ==="))
      .toDF("doc_id", "page")
    val got = TextPipeline.extractContent(docs, col("doc_id"), col("page"),
      minLineChars = 32, minAlnumPct = 50)
    val rows = got.collect().map(r => (r.getAs[Long]("id"),
      r.getAs[String]("content"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_total"))).toSet
    assert(rows == Set(
      (1L, "A proper paragraph of body prose long enough to keep here.", 1L, 3L),
      (2L, "", 0L, 2L)))
    // pure map stage: the physical plan must contain no Exchange at all
    assert(!got.queryExecution.executedPlan.toString.contains("Exchange"),
      got.queryExecution.executedPlan.toString.take(600))
  }

  test("removeDuplicateSpans: removed_tokens equals duplicateSpans' dup_tokens on real docs") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(200)
    val rep = TextPipeline.duplicateSpans(docs, col("doc_id"), col("text"), k = 8, minDocs = 2)
      .select(col("id"), col("dup_tokens"))
    val cut = TextPipeline.removeDuplicateSpans(docs, col("doc_id"), col("text"), k = 8, minDocs = 2)
      .select(col("id"), col("removed_tokens"))
    assert(rep.join(cut, "id")
      .where(col("dup_tokens") =!= col("removed_tokens")).count() == 0)
  }
}
