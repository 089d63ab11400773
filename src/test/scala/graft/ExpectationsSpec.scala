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
      // distinct over {1, 9, NULL}: countDistinct ignores NULL → 2
      // distinct; 4 − 2 = 2 surplus (the dup AND the null row — the
      // null can never be "the first of its tuple")
      ("unique:id", 4L, 2L, false),
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
}
