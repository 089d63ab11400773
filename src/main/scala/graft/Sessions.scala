package graft

import org.apache.spark.sql.SparkSession

/** Shared session bootstrap for every entry point (Agent, Bench,
  * Verify, tests): registers the library's SQL function surface so
  * `spark.sql` users get `minhash_sig` / `simhash` /
  * `sorted_intersect_count` / `vec_dot` / `vec_normsq` without knowing
  * the registration incantation, and pins the session confs the storage
  * layer depends on. Registration is per-session
  * (createOrReplaceTempFunction) and idempotent.
  *
  * THE UTC PIN LIVES HERE: `spark.sql.session.timeZone=UTC` makes the
  * Long-ns epoch derivation from naive parquet timestamps deterministic
  * on any host (graft.sources.Tables interprets TIMESTAMP_NTZ as UTC,
  * matching DuckDB's `epoch_ns`). It is set ONCE, at session
  * construction — `Tables.ensureNsConf` ASSERTS it rather than mutating
  * a live session, so unrelated timestamp rendering can never change
  * depending on whether a Tables call ran first. */
object Sessions {
  def bootstrap(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    functions.MinHash.register(spark)
    functions.VectorExpressions.register(spark)
    functions.Bpe.register(spark)
    spark
  }
}
