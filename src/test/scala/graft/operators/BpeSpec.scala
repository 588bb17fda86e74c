package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def encodeOne(text: String, model: Bpe.BpeModel): Seq[Seq[String]] =
    Seq(text).toDF("t").select(Bpe.encode(col("t"), model))
      .collect().head.getSeq[scala.collection.Seq[String]](0).map(_.toSeq)

  test("hand-traced merge sequence on a planted dictionary") {
    // words: aaab x3, ab x1. Initial pair counts: (a,a) = 6, (a,b) = 4.
    // merge 1 = (a,a): aaab -> [aa, a, b]. Then (a,b) = 4 beats (aa,a) = 3.
    // merge 2 = (a,b): aaab -> [aa, ab]. merge 3 = (aa, ab) -> [aaab].
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab ab")).toDF("id", "text")
    val model = Bpe.train(docs, $"text", numMerges = 3)
    assert(model.merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    assert(encodeOne("aaab ab", model) == Seq(Seq("aaab"), Seq("ab")))
    // unseen words encode greedily with the learned merges
    assert(encodeOne("aab baaab", model) == Seq(Seq("aa", "b"), Seq("b", "aaab")))
  }

  test("greedy left-to-right merge order: aaa + (a,a) gives [aa, a], never [a, aa]") {
    val docs = Seq((1L, "aaa aaa")).toDF("id", "text")
    val model = Bpe.train(docs, $"text", numMerges = 2)
    assert(model.merges == Seq(("a", "a"), ("aa", "a")))
    // even length: pairs merge disjointly left-to-right, no (aa,a) site
    assert(encodeOne("aaaa", model) == Seq(Seq("aa", "aa")))
    // odd run: [aa][aa][a], then (aa,a) fires at the SECOND aa -> [aa, aaa]
    assert(encodeOne("aaaaa", model) == Seq(Seq("aa", "aaa")))
  }

  test("minCount stops training before degenerate singleton merges") {
    // every pair occurs once -> nothing reaches minCount = 2
    val docs = Seq((1L, "abc def")).toDF("id", "text")
    val model = Bpe.train(docs, $"text", numMerges = 5)
    assert(model.merges.isEmpty)
  }

  test("merge list is repartition-invariant and ties break on the pair string") {
    // (a,b) and (c,d) both count 2: lexicographic tiebreak picks (a,b) first
    val docs = Seq((1L, "ab cd"), (2L, "ab cd")).toDF("id", "text")
    val m1 = Bpe.train(docs, $"text", numMerges = 2)
    val m2 = Bpe.train(docs.repartition(7), $"text", numMerges = 2)
    assert(m1.merges == m2.merges)
    assert(m1.merges.head == ("a", "b"))
    val real = Seq((1L, "the cat sat on the mat"), (2L, "the cats sat"),
      (3L, "a hat on the mat")).toDF("id", "text")
    val r1 = Bpe.train(real, $"text", numMerges = 6)
    val r2 = Bpe.train(real.repartition(13), $"text", numMerges = 6)
    assert(r1.merges == r2.merges && r1.merges.size == 6)
  }

  test("decode round-trip: concatenating symbols reproduces every word") {
    val docs = Seq((1L, "the cat sat on the mat"), (2L, "Lowest newer wider low"))
      .toDF("id", "text")
    val model = Bpe.train(docs, $"text", numMerges = 8)
    val viol = docs.select(
      zip_with(Bpe.words($"text"), Bpe.encode($"text", model),
        (w, syms) => concat_ws("", syms) =!= w).as("bad"))
      .select(sum(size(filter($"bad", x => x))).as("v"))
      .collect().head.getLong(0)
    assert(viol == 0L)
  }

  test("encode is a pure narrow projection: no shuffle, no UDF in the plan") {
    val model = Bpe.BpeModel(Seq(("a", "b"), ("ab", "c")))
    val plan = Seq("abc").toDF("t").select(Bpe.encode(col("t"), model))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("BatchEvalPython"))
  }

  test("tokenCount diverges materially from whitespace counts and sizes packing bins") {
    // merges (a,a) then (aa,aa) cover "aaaa" wholly (1 BPE token/word)
    // while "bb" stays unmerged (2 BPE tokens/word): whitespace and BPE
    // counts then disagree 2x on doc 3 — the divergence that makes
    // whitespace-sized packing bins WRONG for the training run
    val docs = Seq((1L, "aaaa aaaa aaaa"), (2L, "aaaa aaaa"), (3L, "bb bb bb bb"))
      .toDF("id", "text")
    val model = Bpe.train(docs, $"text", numMerges = 2)
    assert(model.merges == Seq(("a", "a"), ("aa", "aa")))
    val countsOf = docs.select($"id",
        TextAnalysis.tokenCount($"text").as("ws"),
        Bpe.tokenCount($"text", model).as("bpe"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(countsOf == Map(1L -> ((3L, 3L)), 2L -> ((2L, 2L)), 3L -> ((4L, 8L))),
      countsOf.toString)

    // packing with the REAL counts: bin arithmetic runs over BPE mass
    // (13 tokens at capacity 4 -> last bin 3), per-doc n_tokens carries
    // the tokenizer count, and the plan shape is packSequences' own —
    // swapping the weight column adds no window over unbounded groups
    val packed = TextPipeline.packSequences(
      docs.withColumn("n_tokens", Bpe.tokenCount($"text", model)),
      $"id", $"n_tokens", capacity = 4L)
    val byId = packed.select($"id", $"n_tokens", $"bin_first", $"bin_last")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(byId(3L)._2 == 8L, byId.toString)
    assert(packed.agg(sum($"n_tokens")).head().getLong(0) == 13L)
    assert(packed.agg(max($"bin_last")).head().getLong(0) == 3L) // (13-1) div 4
    // every doc's start offset sits inside its first bin
    assert(packed.where($"offset_in_bin" < 0 || $"offset_in_bin" >= 4).isEmpty)
  }

  test("saveMerges/loadMerges round-trips the pipeline artifact") {
    val model = Bpe.BpeModel(Seq(("a", "b"), ("ab", "cd"), ("x", "yz")))
    val f = java.nio.file.Files.createTempFile("merges", ".txt").toString
    Bpe.saveMerges(model, f)
    assert(Bpe.loadMerges(f) == model)
    // an empty model round-trips too (a corpus below minCount learns none)
    val g = java.nio.file.Files.createTempFile("merges0", ".txt").toString
    Bpe.saveMerges(Bpe.BpeModel(Nil), g)
    assert(Bpe.loadMerges(g) == Bpe.BpeModel(Nil))
  }

  test("merges artifact round-trips through a file:-scheme URI " +
      "(Hadoop FS — the model can live on the cluster store)") {
    // java.nio.file.Paths cannot resolve a `file:` URI, so a green
    // round-trip proves no local-only call sits on the artifact path —
    // the tokenizer model the pipeline's --bpe-merges consumes was the
    // last index-adjacent artifact pinned to the driver's local disk
    val model = Bpe.BpeModel(Seq(("a", "b"), ("ab", "cd")))
    val uri = "file:" +
      java.nio.file.Files.createTempDirectory("bpe_uri").toString + "/m.txt"
    Bpe.saveMerges(model, uri)
    assert(Bpe.loadMerges(uri) == model)
  }
}
