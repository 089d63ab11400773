package graft

import org.apache.spark.sql.SparkSession

/** Shared session bootstrap for every entry point (Agent, Bench,
  * Verify, tests): registers the library's SQL function surface so
  * `spark.sql` users get `minhash_sig` / `simhash` /
  * `sorted_intersect_count` / `vec_dot` / `vec_normsq` without knowing
  * the registration incantation. Registration is per-session
  * (createOrReplaceTempFunction) and idempotent. */
object Sessions {
  def bootstrap(spark: SparkSession): SparkSession = {
    functions.MinHash.register(spark)
    functions.VectorExpressions.register(spark)
    spark
  }
}
