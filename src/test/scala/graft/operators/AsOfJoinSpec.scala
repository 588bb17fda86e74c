package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof picks the latest right row at or before each left time") {
    val trades = Seq((1L, "A", 10L), (2L, "A", 25L), (3L, "B", 5L), (4L, "A", 3L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq((100L, "A", 5L, 1.0), (101L, "A", 10L, 2.0), (102L, "A", 20L, 3.0),
      (103L, "B", 7L, 9.0))
      .toDF("quote_id", "sym", "t", "px")
    val got = AsOfJoin(trades, quotes, "sym", "t", "t", Seq("quote_id", "px"), "quote_id")
      .orderBy($"trade_id")
      .select($"trade_id", $"asof_quote_id", $"asof_px")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(got(0) == ((1L, Some(101L), Some(2.0)))) // equality counts as match
    assert(got(1) == ((2L, Some(102L), Some(3.0)))) // latest at-or-before 25
    assert(got(2) == ((3L, None, None)))            // B has no quote <= 5
    assert(got(3) == ((4L, None, None)))            // before any A quote
  }

  test("duplicate right timestamps resolve to the largest rightOrder") {
    val l = Seq((1L, "A", 10L)).toDF("id", "k", "t")
    val r = Seq((7L, "A", 10L, "first"), (9L, "A", 10L, "last"))
      .toDF("rid", "k", "t", "tag")
    val got = AsOfJoin(l, r, "k", "t", "t", Seq("rid", "tag"), "rid").collect()(0)
    assert(got.getAs[Long]("asof_rid") == 9L)
    assert(got.getAs[String]("asof_tag") == "last")
  }

  test("env config: file parse, env override, API_KEY preference, required keys") {
    import graft.enrich.EnvConfig
    val parsed = EnvConfig.parseEnvFile(
      "# comment\nAPI_KEY=\"k1\"\nAZURE_ENDPOINT_BASE='https://x/'\n\nBAD LINE\nEMPTY=\n")
    assert(parsed == Map("API_KEY" -> "k1", "AZURE_ENDPOINT_BASE" -> "https://x/", "EMPTY" -> ""))

    val dir = java.nio.file.Files.createTempDirectory("env")
    val f = dir.resolve(".env")
    java.nio.file.Files.writeString(f, "AZURE_API_KEY=filekey\nAZURE_ENDPOINT_BASE=https://file/\n")
    // env overrides file; plain API_KEY preferred over AZURE_API_KEY
    val cfg = EnvConfig.load(Some(f), env = Map("API_KEY" -> "envkey"))
    assert(cfg.apiKey == "envkey")
    assert(cfg.endpointUrl.contains(
      "https://file/openai/deployments/gpt-4o/chat/completions?api-version=2024-05-01-preview"))
    // azure mode without endpoint -> error
    intercept[IllegalArgumentException] {
      EnvConfig.load(None, env = Map("AZURE_API_KEY" -> "z"))
    }
    // no key at all -> error
    intercept[IllegalArgumentException] { EnvConfig.load(None, env = Map.empty) }
  }

  test("connectivity probe succeeds against the mock and fails on garbage") {
    import graft.enrich._
    assert(ConnectivityProbe.check(new MockLlmTransport))
    val bad = new LlmTransport {
      override def post(p: LlmPayload) = LlmResponse(500, "nope")
    }
    assert(!ConnectivityProbe.check(bad))
  }
}
