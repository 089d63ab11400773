package graft

import graft.operators.Incremental
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental aggregate maintenance: merging partials of ANY split of
  * the data must be indistinguishable from aggregating from scratch —
  * the invariant that lets a 100 TB rollup absorb a day's delta
  * without rescanning history. */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("merge of partials over arbitrary splits equals the " +
    "from-scratch aggregate, regardless of split count or order") {
    val s = spark
    import s.implicits._
    val rows = (1 to 200).map(i =>
      (s"k${i % 5}", (i * 37 % 101).toLong - 20L))
    val full = rows.toDF("k", "c")
    val scratch = Incremental.mergePartialStats(
        Incremental.partialStats(full, Seq("k"), "c"), Seq("k"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap

    // three uneven splits, merged in a shuffled order
    val splits = Seq(rows.take(13), rows.slice(13, 140), rows.drop(140))
    val partials = splits.map(sp =>
      Incremental.partialStats(sp.toDF("k", "c"), Seq("k"), "c"))
    val merged = Incremental.mergePartialStats(
        partials(2).unionByName(partials(0)).unionByName(partials(1)),
        Seq("k"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(merged === scratch)

    // re-merging an already-merged summary with an empty delta is a
    // no-op (idempotent maintenance)
    val again = Incremental.mergePartialStats(
        Incremental.partialStats(full, Seq("k"), "c")
          .unionByName(Incremental.partialStats(
            full.filter(lit(false)), Seq("k"), "c")),
        Seq("k"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(again === scratch)
  }

  test("scd2: consecutive same-value updates collapse into one run, " +
    "value flips open new intervals that close the previous one " +
    "exactly, and only the last run is current") {
    val s = spark
    import s.implicits._
    val ups = Seq(
      ("u", 10L, "a"), ("u", 20L, "a"), ("u", 30L, "b"),
      ("u", 40L, "a"), ("v", 5L, "x"))
      .toDF("k", "t", "v")
    val out = Incremental.scd2(ups, "k", "t", "v")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_ => r.getLong(3)), r.getBoolean(4)))
      .sortBy(x => (x._1, x._3))
    assert(out.toSeq === Seq(
      ("u", "a", 10L, Some(30L), false),
      ("u", "b", 30L, Some(40L), false),
      ("u", "a", 40L, None, true),
      ("v", "x", 5L, None, true)))
  }

  test("applyChangelog: the latest op wins, trailing deletes remove " +
    "the key, and the same-instant tie resolves D > U > I by the " +
    "declared (t, op, value) rule") {
    val s = spark
    import s.implicits._
    val log = Seq(
      ("a", 1L, "I", 10L), ("a", 2L, "U", 20L),          // a → 20
      ("b", 1L, "I", 5L), ("b", 9L, "D", 0L),            // b gone
      ("c", 3L, "D", 0L), ("c", 7L, "I", 9L),            // c revived
      ("d", 4L, "I", 1L), ("d", 4L, "D", 9L))            // tie: D wins
      .toDF("k", "t", "op", "v")
    val out = Incremental.applyChangelog(log, "k", "t", "op", "v")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out === Map("a" -> ((20L, 2L)), "c" -> ((9L, 7L))))
  }

  test("mean_u re-derives half-up from the MERGED (Σ, n), not from " +
    "per-partial means (the non-algebraic trap)") {
    val s = spark
    import s.implicits._
    // partial means would average to (1 + 100)/2 = 50.5 dollars-ish;
    // the true mean over (1, 1, 100) cents is 34 cents = 340000 µ
    val a = Incremental.partialStats(
      Seq(("k", 1L), ("k", 1L)).toDF("k", "c"), Seq("k"), "c")
    val b = Incremental.partialStats(
      Seq(("k", 100L)).toDF("k", "c"), Seq("k"), "c")
    val out = Incremental.mergePartialStats(a.unionByName(b), Seq("k"))
      .collect().head
    assert(out.getAs[Long]("n") === 3L)
    assert(out.getAs[Long]("sum_c") === 102L)
    assert(out.getAs[Long]("min_c") === 1L)
    assert(out.getAs[Long]("max_c") === 100L)
    assert(out.getAs[Long]("mean_u") === 340000L)
  }
}
