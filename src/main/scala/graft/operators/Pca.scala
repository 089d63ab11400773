package graft.operators

import graft.functions.MatrixExpressions.matProject
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-
  * reduction pass training pipelines run before indexing/clustering
  * (and the OPQ-style rotation the ANN literature pre-composes with
  * PQ).
  *
  * Scale shape: fitting is ONE distributed pass that aggregates the
  * exact sufficient statistics (n, Σx, upper-triangular Σxxᵀ) in a
  * d(d+3)/2-double buffer — 2,144 doubles at d=64, independent of row
  * count; partials combine by vector addition (map-side combine, one
  * O(d²) row per partition shuffles). The d×d eigenproblem is then
  * solved DRIVER-SIDE (cyclic Jacobi — d³ flops, microseconds at
  * d=64; no external linear-algebra dependency), and projection is a
  * single codegen'd kernel expression over literal components
  * ([[graft.functions.MatrixExpressions.MatProject]]) — zero shuffle,
  * embarrassingly parallel.
  *
  * Determinism: the Gram sum is aggregated in DOUBLE over a
  * partitioning-dependent order, so covariance entries can differ by
  * ~1 ulp between runs; Jacobi is deterministic given its input, and
  * the returned eigenvectors are sign-fixed (largest-|component| entry
  * positive, lowest index on ties). Registry exposure therefore rounds
  * projections (rows-only check; exactness properties are pinned in
  * PcaSpec instead).
  */
object Pca {

  /** Fitted transform: `mean` (d), `components` (k×d, orthonormal rows,
    * eigenvalue DESC), `eigenvalues` (k, variances along components). */
  final case class PcaModel(mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double])

  /** Sufficient-statistics buffer: n, Σx (d), upper triangle of Σxxᵀ
    * (d(d+1)/2, row-major). Sized lazily from the first vector. */
  case class GramBuf(n: Long, s: Array[Double], g: Array[Double])

  /** Single-argument udaf input wrapper (one array<double> column). */
  case class VecArg(v: Seq[Double])

  class GramAggregator extends Aggregator[VecArg, GramBuf, GramBuf] {
    override def zero: GramBuf = GramBuf(0L, Array.empty, Array.empty)
    override def reduce(b: GramBuf, a: VecArg): GramBuf = {
      val v = a.v
      val d = v.length
      val buf = if (b.n == 0L && b.s.isEmpty)
        GramBuf(0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))
      else b
      require(buf.s.length == d,
        s"PCA needs uniform dimension: saw ${buf.s.length} then $d")
      var i = 0
      var t = 0
      while (i < d) {
        val vi = v(i)
        buf.s(i) += vi
        var j = i
        while (j < d) { buf.g(t) += vi * v(j); j += 1; t += 1 }
        i += 1
      }
      GramBuf(buf.n + 1, buf.s, buf.g)
    }
    override def merge(a: GramBuf, b: GramBuf): GramBuf =
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        require(a.s.length == b.s.length,
          s"PCA needs uniform dimension: ${a.s.length} vs ${b.s.length}")
        var i = 0
        while (i < a.s.length) { a.s(i) += b.s(i); i += 1 }
        i = 0
        while (i < a.g.length) { a.g(i) += b.g(i); i += 1 }
        GramBuf(a.n + b.n, a.s, a.g)
      }
    override def finish(r: GramBuf): GramBuf = r
    override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
    override def outputEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (classic
    * sweep over upper-triangle pivots until off-diagonal mass is
    * negligible). Returns (eigenvalues, eigenvectors-as-rows), sorted
    * eigenvalue DESC, ties by original index; each vector sign-fixed so
    * its largest-|component| entry (lowest index on ties) is positive.
    * O(d³) per sweep, driver-side only — never sees row data. */
  private[operators] def jacobiEigen(sym: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = sym.length
    val a = Array.tabulate(d, d)((i, j) => sym(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val maxSweeps = 64
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > 1e-18) {
            // standard stable rotation (Golub & Van Loan 8.4)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val eig = order.map(i => a(i)(i)).toArray
    val vecs = order.map { col =>
      val w = Array.tabulate(d)(r => v(r)(col))
      // sign convention: largest-|x| entry positive (lowest index wins
      // ties) — eigenvectors are otherwise defined only up to sign
      var best = 0
      var i = 1
      while (i < d) {
        if (math.abs(w(i)) > math.abs(w(best))) best = i
        i += 1
      }
      if (w(best) < 0) { i = 0; while (i < d) { w(i) = -w(i); i += 1 } }
      w
    }.toArray
    (eig, vecs)
  }

  /** Fit a k-component PCA: one distributed sufficient-statistics pass,
    * then the driver-side eigensolve of the d×d covariance
    * C = Σxxᵀ/n − x̄x̄ᵀ. */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val agg = udaf(new GramAggregator(), Encoders.product[VecArg])
    val row = df
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .where(col("v").isNotNull)
      .agg(agg(col("v")).as("b"))
      .head().getStruct(0)
    val buf = GramBuf(row.getLong(0),
      row.getSeq[Double](1).toArray, row.getSeq[Double](2).toArray)
    require(buf.n > 0, "PCA: no vectors to fit")
    val d = buf.s.length
    require(k >= 1 && k <= d, s"PCA needs 1 <= k <= dim, got k=$k dim=$d")
    val n = buf.n.toDouble
    val mean = buf.s.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = buf.g(t) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1
        t += 1
      }
      i += 1
    }
    val (eig, vecs) = jacobiEigen(cov)
    PcaModel(mean, vecs.take(k), eig.take(k))
  }

  /** Project each vector onto the model's components: (…, pcCol:
    * array<double> of length k). Pure codegen'd projection — zero
    * shuffle. */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
      pcCol: String = "pc"): DataFrame =
    df.withColumn(pcCol,
      matProject(transform(col(vecCol), x => x.cast("double")),
        model.mean, model.components))
}
