package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (north-star operator; absent
  * in the reference — BASELINE.json north_star).
  *
  * Everything is built from codegen'd built-ins (`zip_with`, `aggregate`)
  * over `array<double>` — no UDFs, no driver-side loops.
  *
  * Scale paths:
  *  - `bruteForceTopK`: queries × corpus with a broadcast query side —
  *    correct baseline; cost O(|Q|·|C|), fine when |Q| is small and the
  *    corpus is scanned once, distributed.
  *  - `lshTopK`: sign-random-projection buckets (hyperplanes derived
  *    deterministically from md5, so engines agree) → candidates only join
  *    within their bucket — the 100 TB path. Recall < 1 by construction;
  *    probe multiple hash tables (`numTables`) to raise it.
  */
object Similarity {

  /** Cast a float/double array column to array<double> (so arithmetic is
    * double-precision IEEE on both our side and any oracle engine). */
  def asDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  /** Dot product of two array<double> columns (sequential fold — the
    * summation order is the array order, deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** All pairs (id_a < id_b) with cosine — oracle-sized data only;
    * the scale path is lshTopK / Dedup.lshCandidatePairs. */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val a = v.select(col("id").as("id_a"), col("v").as("va"))
    val b = v.select(col("id").as("id_b"), col("v").as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("va"), col("vb")).as("cosine"))
  }

  /** Brute-force top-k cosine neighbors for each query vector.
    * The (small) query side is broadcast; the corpus side streams through
    * executors once — no shuffle of the corpus. Ties broken by corpus id
    * for determinism. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 6).desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine_r"))
  }

  /** Sign-random-projection bucket id: `numPlanes` hyperplanes whose
    * components are ±1 derived from md5(table:plane:dim) — deterministic,
    * engine-portable, and codegen'd. Bucket = bit-packed signs. */
  def srpBucket(vec: Column, dim: Int, numPlanes: Int, table: Int): Column = {
    val planeBits = (0 until numPlanes).map { p =>
      // component_{p,i} = +1 if first md5 hex nibble of "t:p:i" is < '8'
      val contribs = (0 until dim).map { i =>
        val sign = when(
          substring(md5(lit(s"$table:$p:$i")), 1, 1) < lit("8"), 1.0)
          .otherwise(-1.0)
        sign * element_at(vec, i + 1)
      }
      val proj = contribs.reduce(_ + _)
      when(proj >= 0, lit(1L) * (1L << p)).otherwise(lit(0L))
    }
    planeBits.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: hash queries and corpus into SRP
    * buckets over `numTables` tables, join within buckets only, then rank.
    * At 100 TB this replaces the |Q|·|C| product with per-bucket work. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, numPlanes: Int = 8,
      numTables: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, idAs: String, vAs: String): DataFrame = {
      val v = df.select(col(idCol).as(idAs), asDouble(col(vecCol)).as(vAs))
      val tables = (0 until numTables).map { t =>
        v.withColumn("table", lit(t))
          .withColumn("bucket", srpBucket(col(vAs), dim, numPlanes, t))
      }
      tables.reduce(_ unionAll _)
    }
    val q = broadcast(bucketed(queries, "query_id", "qv"))
    val c = bucketed(corpus, "neighbor_id", "cv")
    val cand = c.join(q, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cand.select(col("query_id"), col("neighbor_id"),
      cosine(col("qv"), col("cv")).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 6).desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine_r"))
  }
}
