package graft.enrich

import org.apache.spark.sql.{DataFrame, Dataset}

import java.util.concurrent.{Callable, Executors, TimeUnit}
import scala.jdk.CollectionConverters._

/** E1/E2: the distributed LLM-map operator — `mapPartitions` with a bounded
  * thread pool and a per-partition rate limiter (SURVEY.md §2.7).
  *
  * Scale design: the reference fans out 250 concurrent requests from one
  * process; here each of N partitions runs `maxConcurrent / N` workers and a
  * token bucket at `targetRpm / N`, so the global in-flight and request-rate
  * envelopes match the reference's semaphore + AsyncLimiter regardless of
  * cluster size. Transport/pool lifecycle is per-partition (the analogue of
  * the reference's pooled ClientSession). Rows stream through the pool in
  * input order; results preserve order within a partition.
  */
object EnrichOperator {

  final case class Doc(key: String, content: String)
  final case class Enriched(key: String, ok: Boolean, description: String, raw: String)

  def enrich(
      docs: Dataset[Doc],
      transportFactory: () => LlmTransport,
      promptTemplate: String,
      config: EnrichConfig = EnrichConfig(),
      sleeper: Long => Unit = Thread.sleep): Dataset[Enriched] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nParts = math.max(1, docs.rdd.getNumPartitions)
    val perPartConcurrency = math.max(1, config.maxConcurrent / nParts)
    val perPartRpm = config.targetRpm.toDouble / nParts

    docs.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val transport = transportFactory()
        val limiter = new RateLimiter(perPartRpm, sleeper)
        val caller = new RetryingLlmCaller(transport, config, sleeper)
        val pool = Executors.newFixedThreadPool(perPartConcurrency)
        try {
          val tasks = rows.map { doc =>
            new Callable[Enriched] {
              override def call(): Enriched = {
                val payload = PromptTemplate.buildPayload(promptTemplate, doc.content)
                limiter.acquire()
                val r = caller.call(payload)
                Enriched(doc.key, r.ok, r.description.orNull, r.raw.orNull)
              }
            }
          }.toSeq.asJava
          pool.invokeAll(tasks).asScala.map(_.get()).iterator
        } finally {
          pool.shutdown()
          pool.awaitTermination(1, TimeUnit.HOURS)
        }
      }
    }
  }
}
