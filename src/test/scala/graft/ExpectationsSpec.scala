package graft

import graft.operators.Expectations
import graft.operators.Expectations._
import org.scalatest.funsuite.AnyFunSuite

/** Declarative expectations runner: exact violation counts per check
  * kind, declaration order preserved, NULL-pass semantics for
  * range/enum, per-check row basis (FK counts non-null children). */
class ExpectationsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("each check kind counts its violations exactly; NULLs pass " +
    "range/enum but fail not_null; FK basis is the non-null child " +
    "count; rows come back in declaration order") {
    val s = spark
    import s.implicits._
    val child = Seq(
      (Some(1L), 5L, "a"),
      (Some(1L), 50L, "b"),   // dup id; 50 out of range; b not in set
      (Some(9L), 7L, "a"),    // 9 has no parent
      (None, 8L, "a"))        // null id: fails not_null, passes fk
      .toDF("id", "v", "k")
    val parent = Seq(1L, 2L, 3L).toDF("pid")
    val out = Expectations.run(child, Seq(
        NotNull("id"), Unique(Seq("id")), InRange("v", 1L, 10L),
        InSet("k", Seq("a")), FkExists("id", parent, "pid")))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(out.toSeq === Seq(
      ("not_null:id", 4L, 1L, false),
      // dbt/GE unique semantics: NULL tuples are excluded from the
      // check (3 non-null keys, 2 distinct → 1 surplus — only the
      // duplicate; the NULL row is NotNull's business, not Unique's)
      ("unique:id", 4L, 1L, false),
      ("range:v", 4L, 1L, false),
      ("in_set:k", 4L, 1L, false),
      ("fk:id", 3L, 1L, false)))
    // a fully clean table passes everything
    val clean = Seq((1L, 5L, "a"), (2L, 6L, "a")).toDF("id", "v", "k")
    val ok = Expectations.run(clean, Seq(
        NotNull("id"), Unique(Seq("id")), InRange("v", 1L, 10L),
        InSet("k", Seq("a")), FkExists("id", parent, "pid")))
      .collect()
    assert(ok.forall(_.getBoolean(3)))
    assert(ok.forall(_.getLong(2) == 0L))
  }

  test("multi-column Unique treats the TUPLE as the key; duplicate " +
    "names are rejected") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x"), (1L, "y"), (1L, "x")).toDF("a", "b")
    val out = Expectations.run(df, Seq(Unique(Seq("a", "b"))))
      .collect().head
    assert(out.getLong(2) === 1L) // only (1, x) repeats
    val e = intercept[IllegalArgumentException] {
      Expectations.run(df, Seq(NotNull("a"), NotNull("a")))
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("an EMPTY table passes every check with 0 violations — never " +
    "NULL verdicts from NULL sums") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long, String)].toDF("id", "v", "k")
    val parent = Seq(1L).toDF("pid")
    val out = Expectations.run(empty, Seq(
        NotNull("id"), Unique(Seq("id")), InRange("v", 1L, 10L),
        InSet("k", Seq("a")), FkExists("id", parent, "pid")))
      .collect()
    assert(out.length === 5)
    assert(out.forall(r => !r.isNullAt(2) && r.getLong(2) == 0L),
      out.mkString("\n"))
    assert(out.forall(r => !r.isNullAt(3) && r.getBoolean(3)),
      out.mkString("\n"))
  }

  test("Fresh: verdict is table-level (max within the lag budget); " +
    "a stale feed and an EMPTY feed both fail — the one check where " +
    "empty is not a pass") {
    val s = spark
    import s.implicits._
    val fresh = Seq((1L, 95L), (2L, 100L)).toDF("id", "t")
    val stale = Seq((1L, 10L), (2L, 20L)).toDF("id", "t")
    def verdict(df: org.apache.spark.sql.DataFrame) =
      Expectations.run(df, Seq(Fresh("t", asOf = 110L, maxLag = 15L)))
        .collect().head
    assert(verdict(fresh).getBoolean(3))   // max 100 >= 110-15
    assert(!verdict(stale).getBoolean(3))  // max 20 < 95
    val empty = Seq.empty[(Long, Long)].toDF("id", "t")
    val e = verdict(empty)
    assert(!e.getBoolean(3) && e.getLong(2) === 1L)
  }

  test("an all-NULL key column passes Unique (nothing to compare) " +
    "while NotNull still flags every row") {
    val s = spark
    import s.implicits._
    val df = Seq((Option.empty[Long], 1L), (Option.empty[Long], 2L))
      .toDF("id", "v")
    val out = Expectations.run(df, Seq(Unique(Seq("id")),
        NotNull("id"))).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out("unique:id") === ((0L, true)))
    assert(out("not_null:id") === ((2L, false)))
  }
}
