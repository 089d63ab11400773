package graft

import graft.queries.{Q, QueryDef}
import org.scalatest.funsuite.AnyFunSuite

/** The query registry is the correctness gate's source of truth: a
  * duplicate name — across the six per-file maps or within one `Map`
  * literal — silently drops a definition from verification (it happened:
  * `stats_key_skew` shadowed its sibling for several rounds). Both
  * constructors must refuse collisions loudly.
  */
class QRegistrySpec extends AnyFunSuite {
  private val d = QueryDef((_, _) => null, None)

  test("merge throws on a cross-map duplicate name") {
    val e = intercept[IllegalArgumentException] {
      Q.merge(Map("a" -> d, "b" -> d), Map("b" -> d, "c" -> d))
    }
    assert(e.getMessage.contains("b"))
  }

  test("Q.m throws on a within-map duplicate name") {
    val e = intercept[IllegalArgumentException] {
      Q.m("x" -> d, "y" -> d, "x" -> d)
    }
    assert(e.getMessage.contains("x"))
  }

  test("merge and Q.m pass through distinct names") {
    assert(Q.merge(Q.m("a" -> d), Q.m("b" -> d)).keySet == Set("a", "b"))
  }

  test("the real registry loads under both guards") {
    // Forces SparkEntry.all through merge + the six Q.m sites; a
    // collision introduced anywhere fails here before the driver runs.
    assert(SparkEntry.queries.size >= 355)
  }
}
