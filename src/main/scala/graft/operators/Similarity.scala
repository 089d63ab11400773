package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.functions.VectorExpressions.{vecDot, vecNormSq}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (north-star operator; absent
  * in the reference — BASELINE.json north_star).
  *
  * Hot kernels (dot product, squared norm) are custom codegen'd Catalyst
  * expressions (graft.functions.VectorExpressions) — Spark's higher-order
  * functions interpret their lambda per element, which dominates cost at
  * millions of pairs. Fold order is identical, so results are unchanged.
  * Norms are computed once per vector, not once per pair.
  *
  * Scale paths:
  *  - `bruteForceTopK`: broadcast the (small) query side; the corpus
  *    streams through executors once — correct baseline, cost O(|Q|·|C|).
  *  - `lshTopK`: sign-random-projection buckets (hyperplanes derived
  *    deterministically from md5) → candidates join within buckets only —
  *    the 100 TB path. Recall < 1 by construction; raise `numTables` to
  *    trade cost for recall.
  */
object Similarity {

  /** Cast a float/double array column to array<double> (so arithmetic is
    * double-precision IEEE on both our side and any oracle engine). */
  def asDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  def dot(a: Column, b: Column): Column = vecDot(a, b)

  def norm(a: Column): Column = sqrt(vecNormSq(a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** id/vector/precomputed-norm projection. */
  private def prep(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vAs: String, nAs: String): DataFrame =
    df.select(col(idCol).as(idAs), asDouble(col(vecCol)).as(vAs))
      .withColumn(nAs, sqrt(vecNormSq(col(vAs))))

  /** All pairs (id_a < id_b) with cosine — oracle-sized data only;
    * the scale path is lshTopK / Dedup.lshCandidatePairs. */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val a = prep(emb, idCol, vecCol, "id_a", "va", "na")
    val b = prep(emb, idCol, vecCol, "id_b", "vb", "nb")
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (vecDot(col("va"), col("vb")) / (col("na") * col("nb")))
          .as("cosine"))
  }

  /** Brute-force top-k cosine neighbors for each query vector.
    * Ties broken by corpus id for determinism. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(prep(queries, idCol, vecCol, "query_id", "qv", "qn"))
    val c = prep(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 6).desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine_r"))
  }

  /** Deterministic ±1 hyperplane for (table, plane): component i is +1
    * iff the first md5 nibble of "t:p:i" is < 8. Same family the SQL
    * oracle can reproduce; computed driver-side as a literal array. */
  private[operators] def hyperplane(table: Int, plane: Int, dim: Int)
      : Seq[Double] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until dim).map { i =>
      val h = md.digest(s"$table:$plane:$i".getBytes(StandardCharsets.UTF_8))
      if (((h(0) >> 4) & 0xf) < 8) 1.0 else -1.0
    }
  }

  /** Sign-random-projection bucket id: bit-packed signs of `numPlanes`
    * hyperplane projections, each projection one codegen'd dot against a
    * literal array. */
  def srpBucket(vec: Column, dim: Int, numPlanes: Int, table: Int): Column =
    (0 until numPlanes).map { p =>
      val plane = typedLit(hyperplane(table, p, dim))
      when(vecDot(vec, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** SRP-LSH bucketed near-pair search: self-join within (table, bucket)
    * only, exact cosine on the candidates, threshold filter. The scale
    * path behind Dedup.embeddingNearDupLsh — replaces cosinePairs'
    * crossJoin with per-bucket candidate work. */
  def cosineNearPairsLsh(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, numPlanes: Int, numTables: Int)
      : DataFrame = {
    val v = prep(emb, idCol, vecCol, "id", "v", "n")
    val bucketed = (0 until numTables).map { t =>
      v.withColumn("table", lit(t))
        .withColumn("bucket", srpBucket(col("v"), dim, numPlanes, t))
    }.reduce(_ unionAll _)
    val a = bucketed.select(col("table"), col("bucket"),
      col("id").as("id_a"), col("v").as("va"), col("n").as("na"))
    val b = bucketed.select(col("table"), col("bucket"),
      col("id").as("id_b"), col("v").as("vb"), col("n").as("nb"))
    a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (vecDot(col("va"), col("vb")) / (col("na") * col("nb")))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** LSH-bucketed approximate top-k: hash queries and corpus into SRP
    * buckets over `numTables` tables, join within buckets only, rank by
    * cosine. At 100 TB this replaces the |Q|·|C| product with per-bucket
    * candidate work. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, numPlanes: Int = 8,
      numTables: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, idAs: String, vAs: String, nAs: String)
        : DataFrame = {
      val v = prep(df, idCol, vecCol, idAs, vAs, nAs)
      val tables = (0 until numTables).map { t =>
        v.withColumn("table", lit(t))
          .withColumn("bucket", srpBucket(col(vAs), dim, numPlanes, t))
      }
      tables.reduce(_ unionAll _)
    }
    val q = broadcast(bucketed(queries, "query_id", "qv", "qn"))
    val c = bucketed(corpus, "neighbor_id", "cv", "cn")
    val scored = c.join(q, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 6).desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine_r"))
  }
}
