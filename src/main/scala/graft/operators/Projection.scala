package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sparse random projection for embedding columns (Achlioptas 2003, the
  * database-friendly Johnson-Lindenstrauss construction): each output
  * dimension is a signed sparse combination of input dimensions with
  * weights drawn {+1, -1, 0} at probabilities {1/6, 1/6, 2/3}.
  *
  * The weight matrix is a pure function of a seed string (md5 arithmetic,
  * no JVM RNG), materialized as LITERAL arrays inside the plan — so the
  * projection is an embarrassingly parallel codegen'd projection with zero
  * shuffle, zero driver state, and any engine can re-derive the exact same
  * matrix from the seed. Dot products fold in ARRAY ORDER (deterministic
  * left fold, not a shuffle-order sum), so results are bit-stable under
  * repartition and cross-engine.
  *
  * This is the dimensionality-reduction step in front of clustering / ANN
  * at 100 TB: 64-dim float vectors become k-dim sketches that preserve
  * pairwise distances within JL distortion while cutting shuffle bytes by
  * dim/k. The dense cousin of [[Similarity]]'s sign-only SRP-LSH.
  */
object Projection {

  /** Deterministic Achlioptas weight matrix: weights(j)(i) for output dim j,
    * input dim i, derived from md5(seed:j:i) — {+1 at 1/6, -1 at 1/6, 0}.
    */
  def sparseWeights(dim: Int, k: Int, seed: String = "graft-srp"): Array[Array[Int]] = {
    require(dim > 0 && k > 0)
    Array.tabulate(k, dim) { (j, i) =>
      val d = MessageDigest.getInstance("MD5")
        .digest(s"$seed:$j:$i".getBytes(StandardCharsets.UTF_8))
      // first 8 hex digits = first 4 bytes, as an unsigned 32-bit value
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (h % 6) match {
        case 0 => 1
        case 1 => -1
        case _ => 0
      }
    }
  }

  /** The k projected coordinates of `vec` (array<float|double>): exact
    * per-element double products folded left in array order; `+ 0.0`
    * normalizes a potential -0.0 so the zero sign can never differ between
    * engines.
    */
  def project(vec: Column, weights: Array[Array[Int]]): Seq[Column] =
    weights.toSeq.map { wj =>
      val w = typedLit(wj.toSeq)
      aggregate(
        zip_with(vec, w, (x, wi) => x.cast("double") * wi.cast("double")),
        lit(0.0), (acc, x) => acc + x) + lit(0.0)
    }

  /** Squared L2 distance of two projected points given their coordinate
    * columns (for specs / distortion measurement).
    */
  def sq(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => val d = x - y; d * d }.sum
}
