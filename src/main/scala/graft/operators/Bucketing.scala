package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the pre-shuffle trade: pay one shuffle at
  * WRITE time (`bucketBy` on the join key), then every subsequent join
  * on that key runs shuffle-free, reading bucket i of both sides into
  * the same task. At 100 TB this converts the recurring cost of a
  * fact-to-fact join (each side re-shuffled per query) into a one-time
  * layout decision — the storage-level analog of the reference's
  * "address the slave by identical names" pairing (hacluster.go:165-211),
  * but for data instead of catalogs.
  *
  * Buckets must agree on count and key for the exchange-free plan;
  * `sortBy` additionally removes the sort before the merge join.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted table at `path` (registered as
    * `table` in the session catalog — bucketing metadata lives in the
    * catalog, which is why this is saveAsTable, not a bare parquet
    * write). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      key: String,
      numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)

  /** Inner join of two same-bucketed tables on their bucket key: plans
    * as a sort-merge join with NO shuffle exchange on either side.
    * Validates that both tables are bucketed on `key` with the SAME
    * bucket count — a mismatch would silently degrade to the full
    * shuffle this operator exists to eliminate. */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame = {
    def spec(t: String) = {
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t))
      meta.bucketSpec.getOrElse(
        throw new IllegalArgumentException(s"table $t is not bucketed"))
    }
    val (l, r) = (spec(leftTable), spec(rightTable))
    // the spec must be EXACTLY the join key: a table bucketed on
    // (key, other) is distributed by the composite hash, not co-located
    // on `key` alone — contains() would accept it and the join would
    // silently plan the full shuffle this validation exists to prevent
    require(l.bucketColumnNames == Seq(key) &&
      r.bucketColumnNames == Seq(key),
      s"both tables must be bucketed on exactly '$key' " +
        s"(got ${l.bucketColumnNames}, ${r.bucketColumnNames})")
    require(l.numBuckets == r.numBuckets,
      s"bucket counts differ: ${l.numBuckets} vs ${r.numBuckets} — " +
        "the join would shuffle")
    spark.table(leftTable).join(spark.table(rightTable), key)
  }

  /** Morton (Z-order) key: interleave the low `bits` bits of two
    * non-negative dimension columns (a's bit i → output bit 2i+1, b's
    * → 2i). Sorting storage by this key clusters BOTH dimensions at
    * once, so parquet row-group min/max envelopes stay tight on each
    * dimension separately and a filter on either (or both) skips row
    * groups at the footer — the two-dimensional generalization of the
    * layout_sorted_scan single-column sort, and the standard layout
    * trade (Delta/Iceberg OPTIMIZE ZORDER) expressed as a plain
    * column expression. Pure bitwise projection (codegen'd,
    * whole-stage); 2·bits ≤ 62 keeps the result a positive Long. */
  def mortonKey(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column, bits: Int)
      : org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, s"need 1 <= bits <= 31: $bits")
    import org.apache.spark.sql.functions._
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a.cast("long"), i)
          .bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b.cast("long"), i)
          .bitwiseAND(lit(1L)), 2 * i))
    }
  }
}
