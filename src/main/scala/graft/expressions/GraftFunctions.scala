package graft.expressions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Column/SQL surface for the native expressions.
  *
  * Two registration paths:
  *   - [[GraftExtensions]] for `spark.sql.extensions=graft.expressions.GraftExtensions`
  *     (cluster-wide SQL availability), and
  *   - [[GraftFunctions.register]] for an existing session (used by the
  *     operators so `graft_simhash64` / `graft_cosine_sim` resolve lazily).
  */
object GraftFunctions {

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    ("graft_cosine_sim",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine_sim"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  /** Column API constructing the expressions directly (no registry needed). */
  private def exprCol(e: Expression): Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)
  private def expr(c: Column): Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)

  def simhash64(c: Column): Column = exprCol(SimHash64(expr(c)))
  def cosineSim(a: Column, b: Column): Column =
    exprCol(CosineSimilarity(expr(a), expr(b)))
  def minhashSig(text: Column, shingleWords: Int, k: Int): Column =
    exprCol(MinHashSig(expr(text), shingleWords, k))
  def shingleHashes(text: Column, shingleWords: Int): Column =
    exprCol(ShingleHashSet(expr(text), shingleWords))
  def charNgrams(text: Column, n: Int): Column =
    exprCol(CharNgrams(expr(text), n))
  def srpSig(vec: Column, bits: Int, offset: Int = 0): Column =
    exprCol(SrpSignature(expr(vec), bits, offset))
}

/** `SparkSessionExtensions` injector — the deployment-grade registration
  * path (`--conf spark.sql.extensions=graft.expressions.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}
