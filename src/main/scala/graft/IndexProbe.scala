package graft

import graft.operators.Dedup
import graft.streaming.StreamIngest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Store-flatness probe for the growing indexes: ingest the SAME
  * small batch against stores of growing size (documents/embeddings
  * replicated 1x, 4x, 8x with disjoint ids, each compacted into the
  * pruned epoch) and time (a) the per-step ingest/probe cost (r16 —
  * the evidence behind the pruned layout) and (b) the per-tick FOLD
  * cost (r17 — the evidence behind the LSM tiering: the r16 fold
  * rewrote the ENTIRE store every compaction, linear by
  * construction; the tiered fold writes the hot tail as one small
  * segment and only merges geometrically, so a small-tail fold must
  * be ~flat in store size). Prints ONE JSON line:
  *
  * {"metric":"index_probe","unit":"sec","batch_rows":B,
  *  "lsh":{"store_rows":[..],"step_sec":[..],"growth":g,
  *         "fold_sec":[..],"fold_growth":g2},
  *  "ivf":{...}, "flagged":[..]}
  *
  * growth = sec(max store) / sec(min store); flagged when growth
  * exceeds half the store ratio (i.e. clearly tracking the store,
  * not the batch) AND the absolute time exceeds 1s.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.IndexProbe"
  * (defaults to /root/testdata/sf0.1; wall times are local[N]
  * medians of 3 reps after 1 warm-up). */
object IndexProbe {

  private val Mults = Seq(1, 4, 8)
  private val Reps = 3

  private def timeIt(f: => Unit): Double = {
    f // warm-up (JIT + codegen caches; files are fresh per rep below)
    val ts = (1 to Reps).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.sorted
    ts(Reps / 2)
  }

  /** `docs` replicated `mult` times with disjoint id spaces (offset
    * stride chosen far above any fixture id) and texts salted per
    * replica so replicas are NOT near-dups of each other — the store
    * grows in unique content, as a real corpus does. */
  private def replicate(docs: DataFrame, idCol: String, mult: Int,
      salt: Boolean): DataFrame =
    (0 until mult).map { k =>
      val d = docs.withColumn(idCol,
        col(idCol) + lit(k.toLong * 100000000L))
      if (salt && k > 0)
        d.withColumn("text",
          concat_ws(" ", col("text"), lit(s"replica_salt_$k"),
            col(idCol).cast("string")))
      else d
    }.reduce(_.unionByName(_))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = Bench.session()
    val root = "/tmp/graft_index_probe"
    val fsRoot = new org.apache.hadoop.fs.Path(root)
    val fs = fsRoot.getFileSystem(spark.sessionState.newHadoopConf())

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("id"), col("text"))
    val batch = docs.orderBy(col("id")).limit(200)
      .withColumn("id", col("id") + lit(900000000L))
      .withColumn("text",
        concat_ws(" ", col("text"), lit("probe_batch_tail")))
      .cache()
    val batchRows = batch.count()

    def lshStep(mult: Int): (Long, Double, Double, Double) = {
      val idx = s"$root/lsh_$mult/idx"
      val marks = s"$root/lsh_$mult/marks"
      val store = replicate(docs, "id", mult, salt = true)
      val sigs = Dedup.minhashSignatures(store, "id", "text", 8, 3)
      Dedup.lshBandsFromSig(sigs, 4, 8)
        .write.mode("overwrite").parquet(s"$idx/bands/batch=0")
      sigs.write.mode("overwrite").parquet(s"$idx/sigs/batch=0")
      StreamIngest.compactLshIndex(spark, idx,
        buckets = StreamIngest.DefaultIndexBuckets)
      val storeRows = StreamIngest.readLshIndex(spark, idx)._2.count()
      val sec = timeIt {
        StreamIngest.lshIngestBatch(batch, "id", "text", idx, marks,
          1L, 8, 4, 3, 4)
        // drop the step's own delta so every rep probes the SAME store
        val p = new org.apache.hadoop.fs.Path(s"$idx/bands/batch=1")
        fs.delete(p, true): Unit
        fs.delete(new org.apache.hadoop.fs.Path(s"$idx/sigs/batch=1"),
          true): Unit
      }
      // FOLD cost with a small hot tail (the per-tick maintenance
      // event): each rep ingests a FRESH 200-doc batch (salted —
      // dups would empty the delta and fold nothing) and times the
      // compaction. r16 re-folded the whole store here (linear);
      // the LSM fold writes one tail segment + at most a small
      // geometric merge, so this must stay ~flat as mult grows.
      val foldTs = (1 to Reps + 1).map { k =>
        val b = batch
          .withColumn("id", col("id") + lit(1000000L * k))
          .withColumn("text", concat_ws(" ", col("text"),
            lit(s"fold_salt_$k"), col("id").cast("string")))
        StreamIngest.lshIngestBatch(b, "id", "text", idx, marks,
          (k + 1).toLong, 8, 4, 3, 4)
        val t0 = System.nanoTime()
        StreamIngest.compactLshIndex(spark, idx,
          buckets = StreamIngest.DefaultIndexBuckets)
        (System.nanoTime() - t0) / 1e9
      }
      val foldSec = foldTs.drop(1).sorted.apply(Reps / 2)
      // RETENTION fold cost (r18 tombstones): expire a small fixed
      // sliver of ids — the pass is an id-column-pruned scan plus an
      // O(expired) tombstone write, never the r17 store rewrite, so
      // it must stay far from linear in store size
      val retSec = {
        val live = StreamIngest.readLshIndex(spark, idx)._2
          .select(col("id")).distinct()
          .filter(pmod(col("id"), lit(1000L)) =!= 0L)
        val t0 = System.nanoTime()
        StreamIngest.compactLshIndex(spark, idx,
          buckets = StreamIngest.DefaultIndexBuckets,
          liveIds = Some(live))
        (System.nanoTime() - t0) / 1e9
      }
      (storeRows, sec, foldSec, retSec)
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding"))
    val anchors = emb.filter(col("vec_id") < 8)
      .select(col("vec_id"),
        graft.operators.Similarity.asDouble(col("embedding")))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray))
      .toSeq.sortBy(_._1)
    val queries = emb.filter(col("vec_id") < 16).cache()
    queries.count(): Unit

    def ivfStep(mult: Int): (Long, Double, Double, Double, Double) = {
      val idx = s"$root/ivf_$mult/idx"
      StreamIngest.ivfIndexInit(spark, idx, anchors)
      StreamIngest.ivfIngestBatch(
        replicate(emb, "vec_id", mult, salt = false),
        "vec_id", "embedding", idx, 0L)
      StreamIngest.compactIvfIndex(spark, idx)
      val storeRows = StreamIngest.readIvfIndex(spark, idx).count()
      val sec = timeIt {
        StreamIngest.ivfIndexTopK(spark, queries, "vec_id",
          "embedding", idx, 5).collect(): Unit
      }
      // DRIFT-CHECK cost (r18 _hist sidecars): the maintenance tick's
      // skew read must be answered from per-segment sidecars —
      // O(segments), ~flat in store size — not a store scan
      val skewSec = timeIt {
        StreamIngest.ivfListSkew(spark, idx): Unit
      }
      // fold cost with a small hot tail (see lshStep)
      val foldTs = (1 to Reps + 1).map { k =>
        val b = queries
          .withColumn("vec_id", col("vec_id") + lit(1000000L * k))
        StreamIngest.ivfIngestBatch(b, "vec_id", "embedding", idx,
          k.toLong)
        val t0 = System.nanoTime()
        StreamIngest.compactIvfIndex(spark, idx)
        (System.nanoTime() - t0) / 1e9
      }
      val foldSec = foldTs.drop(1).sorted.apply(Reps / 2)
      // retention fold cost (r18 tombstones; see lshStep)
      val retSec = {
        val live = StreamIngest.readIvfIndex(spark, idx)
          .select(col("vec_id")).distinct()
          .filter(pmod(col("vec_id"), lit(1000L)) =!= 0L)
        val t0 = System.nanoTime()
        StreamIngest.compactIvfIndex(spark, idx,
          liveIds = Some(live))
        (System.nanoTime() - t0) / 1e9
      }
      (storeRows, sec, foldSec, retSec, skewSec)
    }

    // PER-LIST REPAIR cost (r19 splitIvfLists): a ~fixed-size planted
    // hot list (3000 rows around one real embedding direction, two
    // separable sub-clusters) over a base store growing 8x. The
    // repair reads partition-pruned and rewrites one delta segment +
    // manifest ltomb, so its cost must track the planted rows, not
    // the store (the r18 reclusterIvfIndex axis was O(store) by
    // construction — the judged gap this probe pins the fix for).
    val pAnchor = emb.filter(col("vec_id") === 8L)
      .select(graft.operators.Similarity.asDouble(col("embedding"))
        .as("v"))
      .head().getSeq[Double](0).toArray
    def repairStep(mult: Int): (Long, Long, Double) = {
      val idx = s"$root/rep_$mult/idx"
      StreamIngest.ivfIndexInit(spark, idx,
        anchors :+ (8 -> pAnchor))
      val base = replicate(emb, "vec_id", mult, salt = false)
      val planted = spark.range(3000)
        .select((col("id") + 500000000L).as("vec_id"),
          transform(sequence(lit(0), lit(63)), i =>
            element_at(typedLit(pAnchor.toSeq), i + 1) +
              when(pmod(col("id"), lit(2)) === 0, lit(0.0))
                .otherwise(lit(0.5)) *
              when(i === lit(0), lit(1.0)).otherwise(lit(0.0)))
            .cast("array<float>").as("embedding"))
      StreamIngest.ivfIngestBatch(base, "vec_id", "embedding",
        idx, 0L)
      StreamIngest.ivfIngestBatch(planted, "vec_id", "embedding",
        idx, 1L)
      StreamIngest.compactIvfIndex(spark, idx)
      val hist = StreamIngest.ivfListHistogram(spark, idx)
      val storeRows = hist.values.sum
      val skewedRows = hist.getOrElse(8L, 0L)
      val t0 = System.nanoTime()
      require(StreamIngest.splitIvfLists(spark, idx, maxSkew = 1.2),
        s"repair probe mult=$mult: split did not trigger " +
          s"(hist=$hist)")
      val sec = (System.nanoTime() - t0) / 1e9
      (storeRows, skewedRows, sec)
    }

    fs.delete(fsRoot, true): Unit
    val lsh = Mults.map(lshStep)
    val ivfR = Mults.map(ivfStep)
    val ivf = ivfR.map(r => (r._1, r._2, r._3, r._4))
    val skews = ivfR.map(_._5)
    val repairs = Mults.map(repairStep)

    // PQ/codes face size (r17): the SAME max-mult store ingested into
    // the raw-vector face and the codes face — the stored-index byte
    // ratio is the "index no longer corpus-sized" evidence (assign/
    // holds dim float64s per row, codes/ holds numSub small ints)
    val sIdx = s"$root/size/idx"
    StreamIngest.ivfIndexInit(spark, sIdx, anchors)
    StreamIngest.pqBooksInit(spark, sIdx, graft.operators.Similarity
      .trainPqBooks(emb, "vec_id", "embedding"))
    val store8 = replicate(emb, "vec_id", Mults.last, salt = false)
    StreamIngest.ivfIngestBatch(store8, "vec_id", "embedding",
      sIdx, 0L)
    StreamIngest.ivfPqIngestBatch(store8, "vec_id", "embedding",
      sIdx, 1L)
    StreamIngest.compactIvfIndex(spark, sIdx)
    def epochBytes(sub: String): Long =
      fs.getContentSummary(
        new org.apache.hadoop.fs.Path(s"$sIdx/$sub")).getLength
    val vecBytes = epochBytes("assign_epoch")
    val codeBytes = epochBytes("codes_epoch")

    fs.delete(fsRoot, true): Unit

    def block(rs: Seq[(Long, Double, Double, Double)],
        prefix: String, stepName: String)
        : (String, Seq[(String, Double, Double)]) = {
      val growth = rs.last._2 / rs.head._2
      val foldGrowth = rs.last._3 / rs.head._3
      val retGrowth = rs.last._4 / rs.head._4
      val js = s"""{"store_rows":[${rs.map(_._1).mkString(",")}],""" +
        s""""step_sec":[${rs.map(r => f"${r._2}%.3f").mkString(",")}],""" +
        f""""growth":$growth%.2f,""" +
        s""""fold_sec":[${rs.map(r => f"${r._3}%.3f").mkString(",")}],""" +
        f""""fold_growth":$foldGrowth%.2f,""" +
        s""""ret_sec":[${rs.map(r => f"${r._4}%.3f").mkString(",")}],""" +
        f""""ret_growth":$retGrowth%.2f}"""
      (js, Seq((s"${prefix}_$stepName", growth, rs.last._2),
        (s"${prefix}_fold", foldGrowth, rs.last._3),
        (s"${prefix}_retention", retGrowth, rs.last._4)))
    }
    val (lshJs, lshG) = block(lsh, "lsh", "ingest_step")
    val (ivfJs0, ivfG0) = block(ivf, "ivf", "probe_step")
    val skewGrowth = skews.last / skews.head
    val repairGrowth = repairs.last._3 / repairs.head._3
    val ivfJs = ivfJs0.dropRight(1) +
      s""","skew_sec":[${skews.map(s => f"$s%.3f").mkString(",")}],""" +
      f""""skew_growth":$skewGrowth%.2f,""" +
      s""""repair_store_rows":[${repairs.map(_._1).mkString(",")}],""" +
      s""""repair_skewed_rows":[${repairs.map(_._2).mkString(",")}],""" +
      s""""repair_sec":[${repairs.map(r => f"${r._3}%.3f")
        .mkString(",")}],""" +
      f""""repair_growth":$repairGrowth%.2f}"""
    val ivfG = ivfG0 :+ (("ivf_skew_check", skewGrowth, skews.last)) :+
      (("ivf_split_repair", repairGrowth, repairs.last._3))
    val storeRatio = Mults.last.toDouble / Mults.head
    val flagged = (lshG ++ ivfG)
      .collect { case (n, g, t) if g > storeRatio / 2 && t > 1.0 => n }
    println(s"""{"metric":"index_probe","unit":"sec",""" +
      s""""sf":"$sfDir","batch_rows":$batchRows,""" +
      s""""store_ratio":$storeRatio,"lsh":$lshJs,"ivf":$ivfJs,""" +
      s""""pq_bytes":{"vec":$vecBytes,"codes":$codeBytes,""" +
      f""""shrink":${vecBytes.toDouble / codeBytes}%.1f},""" +
      s""""flagged":[${flagged.map(f => s""""$f"""").mkString(",")}]}""")
    spark.stop()
  }
}
