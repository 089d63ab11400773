package graft

import graft.functions.MatrixExpressions.{matProject, matRank, pqEncode, pqLut, srpPack}
import graft.functions.VectorExpressions.{vecDot, vecNormSq}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential pin for the matrix kernels: each single-node kernel must
  * be BIT-IDENTICAL to the literal-array expression-tree form it
  * replaced in Similarity (same fold order, same normalization, same
  * tie-breaks) on seeded pseudo-random data — including duplicated rows
  * (ties) and the zero vector. */
class MatrixExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val dim = 16
  private val rnd = new scala.util.Random(42)
  private def vec(): Array[Double] =
    Array.fill(dim)(rnd.nextDouble() * 2 - 1)
  // 40 random vectors + a zero vector + two exact duplicates (ties)
  private val dup = vec()
  private lazy val df = ((0 until 40).map(i => (i.toLong, vec())) ++
    Seq((40L, Array.fill(dim)(0.0)), (41L, dup), (42L, dup.clone())))
    .toDF("id", "v")

  // the matrix: 6 rows, includes one duplicated row (rank tie)
  private val matRow = vec()
  private val mat: Array[Array[Double]] =
    Array(vec(), matRow, vec(), matRow.clone(), vec(), vec())

  /** The OLD centroid-ranking tree: array_sort over (score, centroid)
    * structs of per-centroid literal dots (Similarity pre-kernel). */
  private def oldRank(cents: Array[Array[Double]], vCol: Column,
      nCol: Column): Column = {
    val scoredArr = array(cents.indices.map { c =>
      struct((vecDot(vCol, typedLit(cents(c).toSeq)) / nCol).as("score"),
        lit(c).as("centroid"))
    }: _*)
    array_sort(scoredArr, (l, r) =>
      when(l("score") > r("score"), lit(-1))
        .when(l("score") < r("score"), lit(1))
        .otherwise(l("centroid") - r("centroid")))
  }

  private def oldNormalized(v: Column): Column = {
    val n = sqrt(vecNormSq(v))
    transform(v, x => when(n === 0, x).otherwise(x / n))
  }

  test("MatRank ≡ array_sort((score,centroid)) tree, incl. dot ties; " +
    "zero vector ranks all-tie (where the old ANSI division THREW)") {
    // the old tree divides by the norm — under ANSI mode a zero-norm
    // vector is a DIVIDE_BY_ZERO crash, so compare on nonzero vectors
    // only (the kernel ranks by raw dot: same order, no division)
    val rows = df.filter(col("id") =!= 40L)
      .withColumn("n", sqrt(vecNormSq(col("v"))))
      .select(col("id"), matRank(col("v"), mat).as("kernel"),
        transform(oldRank(mat, col("v"), col("n")), s => s("centroid"))
          .as("tree"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"id=${r.getLong(0)}")
    }
    // zero vector: every dot is 0.0 → all-tie → centroid-ascending
    val z = df.filter(col("id") === 40L)
      .select(matRank(col("v"), mat)).collect()(0).getSeq[Int](0)
    assert(z == mat.indices.toSeq)
  }

  test("MatTopN ≡ slice(MatRank, 1, n) on finite vectors for every n, " +
    "incl. dot ties, the zero vector, and n past the matrix size") {
    import graft.functions.MatrixExpressions.matTopN
    for (n <- Seq(1, 2, 3, mat.length, mat.length + 2)) {
      val rows = df
        .select(col("id"), matTopN(col("v"), mat, n).as("bounded"),
          slice(matRank(col("v"), mat), 1, n).as("full"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Int](1) == r.getSeq[Int](2),
          s"id=${r.getLong(0)} n=$n")
      }
    }
  }

  test("MatArgmax ≡ MatRank's top-1 on finite vectors, incl. dot ties " +
    "and the zero vector (rank-1 assignment without the ranking sort)") {
    import graft.functions.MatrixExpressions.matArgmax
    val rows = df
      .select(col("id"), matArgmax(col("v"), mat).as("amax"),
        element_at(matRank(col("v"), mat), 1).as("top1"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"id=${r.getLong(0)}")
    }
  }

  test("PqEncode ≡ argmax(dot − ½‖cent‖²) via array_position tree " +
    "over the normalized vector") {
    val dsub = 4
    val books: Array[Array[Array[Double]]] = Array.fill(dim / dsub)(
      Array.fill(5)(Array.fill(dsub)(rnd.nextDouble() * 2 - 1)))
    // seed a duplicate codebook entry (tie → lowest code)
    books(1)(3) = books(1)(0).clone()
    def oldCodes(vn: Column): Column = array(books.indices.map { m =>
      val sub = slice(vn, m * dsub + 1, dsub)
      val scores = array(books(m).map { cent =>
        vecDot(sub, typedLit(cent.toSeq)) -
          lit(0.5 * cent.map(x => x * x).sum)
      }: _*)
      (array_position(scores, array_max(scores)) - 1).cast("int")
    }: _*)
    val rows = df.select(col("id"),
      pqEncode(col("v"), books, dsub).as("kernel"),
      oldCodes(oldNormalized(col("v"))).as("tree")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"id=${r.getLong(0)}")
    }
  }

  test("PqLut ≡ flat slice/vecDot LUT over the normalized vector, " +
    "bit-for-bit") {
    val dsub = 4
    val books: Array[Array[Array[Double]]] = Array.fill(dim / dsub)(
      Array.fill(3)(Array.fill(dsub)(rnd.nextDouble() * 2 - 1)))
    def oldLut(qn: Column): Column = array((for {
      m <- books.indices
      cent <- books(m)
    } yield vecDot(slice(qn, m * dsub + 1, dsub), typedLit(cent.toSeq)))
      : _*)
    val rows = df.select(col("id"),
      pqLut(col("v"), books, dsub).as("kernel"),
      oldLut(oldNormalized(col("v"))).as("tree")).collect()
    rows.foreach { r =>
      // exact equality on doubles: identical fold order is the contract
      assert(r.getSeq[Double](1) == r.getSeq[Double](2),
        s"id=${r.getLong(0)}")
    }
  }

  test("MatProject ≡ per-row vecDot(v − mean, row) trees (ascending " +
    "fold; zero vector and duplicate rows included)") {
    val mean = vec()
    val centered = transform(col("v"),
      (x, i) => x - element_at(typedLit(mean.toSeq), i + 1))
    val treeForm = array(mat.indices.map(r =>
      vecDot(centered, typedLit(mat(r).toSeq))): _*)
    val rows = df
      .select(col("id"), matProject(col("v"), mean, mat).as("kernel"),
        treeForm.as("tree"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Double](1) === r.getSeq[Double](2), s"id=${r.get(0)}")
    }
  }

  test("SrpPack ≡ sum of when(dot ≥ 0, 1L<<p) sign bits (zero vector " +
    "hashes to all-ones: 0.0 ≥ 0)") {
    val planes: Array[Array[Double]] = Array.fill(7)(vec())
    def oldBucket(vCol: Column): Column = planes.indices.map { p =>
      when(vecDot(vCol, typedLit(planes(p).toSeq)) >= 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val rows = df.select(col("id"),
      srpPack(col("v"), planes).as("kernel"),
      oldBucket(col("v")).as("tree")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}")
    }
    // the zero vector: every dot is 0.0, 0.0 >= 0 ⇒ all planes set
    val z = rows.find(_.getLong(0) == 40L).get
    assert(z.getLong(1) == (1L << planes.length) - 1)
  }

  test("IvfAssign6 == the retired when-chain bit-for-bit: per-anchor " +
    "round(cos,6) BEFORE the max, strict greater-than (tie to the smallest " +
    "list), same fold/norm orders — on random vectors, duplicate " +
    "anchors (exact rounded ties), and non-contiguous list ids") {
    // non-contiguous list ids + a DUPLICATED anchor row: the rounded
    // cosines tie exactly, so the smaller list id must win
    val anchors: Seq[(Int, Array[Double])] =
      Seq(3 -> mat(0), 7 -> matRow, 11 -> matRow.clone(), 20 -> mat(4))
    val sorted = anchors.sortBy(_._1)
    val withNorm = df.filter(col("id") =!= 40L) // zero-norm excluded
      .withColumn("vn", sqrt(vecNormSq(col("v"))))
    // the RETIRED chain, reconstructed verbatim (Similarity r15 form)
    val scored = sorted.map { case (listId, a) =>
      val an = math.sqrt(a.map(x => x * x).sum)
      val c = round(
        vecDot(col("v"), typedLit(a.toSeq)) / (col("vn") * lit(an)), 6)
      struct(c.as("c"), lit(listId.toLong).as("l"))
    }
    val best = scored.reduceLeft((acc, s) =>
      when(s.getField("c") > acc.getField("c"), s).otherwise(acc))
    val want = withNorm.select(col("id"),
      best.getField("l").as("list"), best.getField("c").as("cos_r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val kernel = graft.functions.MatrixExpressions.ivfAssign6(
      col("v"), sorted.map(_._2).toArray,
      sorted.map(_._1.toLong).toArray)
    val got = withNorm.select(col("id"), kernel.as("__a"))
      .select(col("id"), col("__a.list"), col("__a.cos_r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got === want)
    // the duplicate-anchor tie resolved to the SMALLER list id (7)
    // for at least every vector whose best anchor is the dup row
    assert(!got.exists(_._2 == 11L),
      "rounded tie must keep the earlier (smaller) list id")
    // and the plan is ONE kernel node regardless of nlist: a 256-
    // anchor codebook must not grow the expression tree
    val bigAnchors = (0 until 256).map(i => i -> mat(i % mat.length))
    val bigPlan = graft.operators.Similarity.ivfAssignFixed(
      df.withColumnRenamed("id", "vec_id"), "vec_id", "v", bigAnchors)
      .queryExecution.optimizedPlan.toString
    assert(bigPlan.linesIterator.size < 30,
      s"plan grew with nlist:\n${bigPlan.take(1500)}")
  }

  test("IvfProbe6: n=1 reproduces IvfAssign6's pick exactly; larger n " +
    "is the prefix of the full rounded ranking (cos_r DESC, tie to " +
    "the smaller list — stable bounded insertion)") {
    val anchors: Seq[(Int, Array[Double])] =
      Seq(3 -> mat(0), 7 -> matRow, 11 -> matRow.clone(), 20 -> mat(4))
    val sorted = anchors.sortBy(_._1)
    val m2 = sorted.map(_._2).toArray
    val ls = sorted.map(_._1.toLong).toArray
    val nz = df.filter(col("id") =!= 40L)
    // n = 1 == IvfAssign6 bit-for-bit
    val one = nz.select(col("id"),
      graft.functions.MatrixExpressions.ivfAssign6(col("v"), m2, ls)
        .as("__a"),
      graft.functions.MatrixExpressions.ivfProbe6(col("v"), m2, ls, 1)
        .as("__p"))
      .select(col("id"), col("__a.list").as("al"),
        col("__a.cos_r").as("ac"),
        element_at(col("__p"), 1).getField("list").as("pl"),
        element_at(col("__p"), 1).getField("cos_r").as("pc"))
      .collect()
    one.foreach { r =>
      assert(r.getLong(1) == r.getLong(3) &&
        r.getDouble(2) == r.getDouble(4), s"id=${r.getLong(0)}")
    }
    // full-n probe order == the brute rounded ranking computed in Scala
    val rows = nz.select(col("id"), col("v"),
      graft.functions.MatrixExpressions
        .ivfProbe6(col("v"), m2, ls, sorted.size).as("__p"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val vn = math.sqrt(v.map(x => x * x).sum)
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val want = sorted.map { case (l, a) =>
        val an = math.sqrt(a.map(x => x * x).sum)
        val dot = v.zip(a).map { case (x, y) => x * y }.sum
        (l.toLong, r6(dot / (vn * an)))
      }.sortBy { case (l, c) => (-c, l) }
      val got = r.getSeq[org.apache.spark.sql.Row](2)
        .map(p => (p.getLong(0), p.getDouble(1)))
      assert(got == want, s"id=${r.getLong(0)}: $got vs $want")
    }
  }
}
