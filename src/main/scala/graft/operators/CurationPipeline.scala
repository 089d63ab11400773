package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative, config-driven corpus curation — the engine's batch
  * curation surface in the reference's config-file idiom (syncflux is
  * driven entirely by a declarative config, pkg/config/mainconfig.go;
  * this is the same shape applied to the training-data plane): a
  * [[CurationConfig]] names WHAT to keep and the pipeline derives the
  * plan, so a corpus job is a config review, not bespoke code.
  *
  * Step order is FIXED (filter → exact-dedup → sample → split):
  * filters first because they are pushdown-friendly scans that shrink
  * every later stage; dedup before sampling so the sample rate applies
  * to unique content (sampling first would re-weight duplicates);
  * split last so assignments exist only for surviving docs (the split
  * hash is stable under corpus growth, so late splitting loses
  * nothing). Every step reuses the engine's existing deterministic
  * primitive — same md5 conventions, so oracle SQL composes from the
  * same fragments.
  */
final case class CurationConfig(
    minChars: Option[Long] = None,
    maxChars: Option[Long] = None,
    langs: Option[Seq[String]] = None,
    dedupeExact: Boolean = false,
    /** Deterministic hash-sample rate; None keeps everything. */
    sampleNum: Option[Long] = None,
    sampleDen: Long = 100L,
    sampleSeed: String = "cfg",
    /** Append the stable train/validation/test split column. */
    withSplit: Boolean = false)

object CurationPipeline {

  /** Run `cfg` over a documents frame; output keeps the input columns
    * (plus `sample_key` when sampling, `bucket`/`split` when
    * splitting). */
  def run(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, charsCol: String,
      cfg: CurationConfig): DataFrame = {
    val filtered0 = cfg.minChars.foldLeft(docs)((d, m) =>
      d.filter(col(charsCol) >= m))
    val filtered1 = cfg.maxChars.foldLeft(filtered0)((d, m) =>
      d.filter(col(charsCol) <= m))
    val filtered = cfg.langs.foldLeft(filtered1)((d, ls) =>
      d.filter(col(langCol).isin(ls: _*)))
    val deduped =
      if (!cfg.dedupeExact) filtered
      else filtered.join(
        Dedup.exact(filtered, idCol, textCol)
          .select(col("keep_id").as(idCol)),
        Seq(idCol), "left_semi")
    val sampled = cfg.sampleNum.foldLeft(deduped)((d, num) =>
      Curation.hashSample(d, idCol, cfg.sampleSeed, num, cfg.sampleDen))
    if (!cfg.withSplit) sampled
    else sampled
      .withColumn("bucket",
        pmod(conv(substring(md5(col(idCol).cast("string")), 1, 15),
          16, 10).cast("long"), lit(100)))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "validation")
          .otherwise("test"))
  }

  /** Materialize a curated corpus as deterministic training shards:
    * the Curation.shuffleShard assignment (md5 shuffle key → shard,
    * within-shard position) written as `shard=<k>/` parquet
    * partitions, each shard's rows sorted by the shuffle position —
    * so every epoch reader streams the SAME pseudo-random order
    * without a global sort, and a re-export over identical input is
    * byte-for-byte reproducible. One hash-partitioned exchange (the
    * shard key), one within-partition sort, no driver-side state.
    *
    * Returns the shard manifest (shard, n_rows) read back from the
    * written files — the export-completeness receipt a training job
    * checks before consuming. */
  def exportShards(docs: DataFrame, idCol: String, outDir: String,
      seed: String, nShards: Int): Seq[(Long, Long)] = {
    val assigned = Curation.shuffleShard(docs, idCol, seed, nShards)
      .select(col("id").as(idCol), col("shard"), col("pos"))
    val keyed = docs.join(assigned, idCol)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
    keyed.write.mode("overwrite").partitionBy("shard").parquet(outDir)
    docs.sparkSession.read.parquet(outDir)
      // partition-column discovery infers int — pin the Long contract
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
  }
}
