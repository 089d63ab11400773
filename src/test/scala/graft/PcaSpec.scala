package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PCA exactness properties (the rows-only registry entry's evidence):
  * known-axis recovery, orthonormality, eigen residual against a
  * driver-recomputed covariance, trace preservation, projection
  * differential, and eigenvalue stability across partitionings. */
class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def embeddings = spark.read
    .parquet(s"${SparkSpec.Sf0001}/embeddings.parquet")

  test("known 2D axis: points on the (0.6, 0.8) line recover exactly " +
    "that component (sign convention: largest-|x| entry positive)") {
    val s = spark
    import s.implicits._
    // t in {-2,-1,0,1,2} along (0.6,0.8), plus a constant offset
    val df = Seq(-2.0, -1.0, 0.0, 1.0, 2.0)
      .map(t => Seq(10.0 + 0.6f * t, 5.0 + 0.8f * t))
      .map(v => Tuple1(v.map(_.toFloat)))
      .toDF("embedding")
    val m = Pca.fit(df, "embedding", k = 2)
    assert(math.abs(m.components(0)(0) - 0.6) < 1e-6, m.components(0).toSeq)
    assert(math.abs(m.components(0)(1) - 0.8) < 1e-6)
    // all variance on the first axis: λ1 = E[t²] = 2, λ2 ≈ 0
    assert(math.abs(m.eigenvalues(0) - 2.0) < 1e-5)
    assert(math.abs(m.eigenvalues(1)) < 1e-9)
  }

  test("components are orthonormal and satisfy the eigen equation " +
    "against a driver-recomputed covariance") {
    val m = Pca.fit(embeddings, "embedding", k = 8)
    val d = m.mean.length
    // orthonormality
    for (i <- m.components.indices; j <- i until m.components.length) {
      val dot = m.components(i).zip(m.components(j)).map(t => t._1 * t._2).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"V${i}.V$j = $dot")
    }
    // recompute covariance driver-side from raw rows
    val vecs = embeddings.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length.toDouble
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n }
    // C v ≈ λ v per component (float→double data, tolerance 1e-6)
    m.components.zip(m.eigenvalues).foreach { case (v, lam) =>
      val cv = Array.tabulate(d)(i =>
        (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val resid = cv.zip(v).map { case (a, b) =>
        math.abs(a - lam * b) }.max
      assert(resid < 1e-6, s"eigen residual $resid at λ=$lam")
    }
    // eigenvalues descend
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // full-rank trace preservation: Σλ over ALL d = trace(C)
    val full = Pca.fit(embeddings, "embedding", k = d)
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(math.abs(full.eigenvalues.sum - trace) < 1e-6)
  }

  test("projection matches the driver-computed (x - mean)·v and is " +
    "invariant to partitioning at the eigenvalue level") {
    val m = Pca.fit(embeddings, "embedding", k = 4)
    val got = Pca.project(embeddings, "embedding", m)
      .select(col("vec_id"), col("pc")).orderBy("vec_id").limit(5)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    val raw = embeddings.select("vec_id", "embedding").orderBy("vec_id")
      .limit(5).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    got.foreach { case (id, pc) =>
      val v = raw(id)
      m.components.zipWithIndex.foreach { case (comp, c) =>
        val want = comp.indices.map(i => (v(i) - m.mean(i)) * comp(i)).sum
        assert(math.abs(pc(c) - want) < 1e-9, s"id=$id pc$c")
      }
    }
    val m13 = Pca.fit(embeddings.repartition(13), "embedding", k = 4)
    m.eigenvalues.zip(m13.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-8, s"λ drift across partitionings")
    }
  }

  test("registry query emb_pca_project: one row per vector, 8 finite " +
    "components") {
    val out = SparkEntry.queries("emb_pca_project")(spark, SparkSpec.Sf0001)
    val rows = out.collect()
    val n = embeddings.count()
    assert(rows.length.toLong === n)
    rows.take(10).foreach { r =>
      (1 to 8).foreach(i => assert(!r.isNullAt(i) &&
        !r.getDouble(i).isNaN, s"pc$i"))
    }
  }
}
