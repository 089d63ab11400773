package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Vector×matrix kernels for the ANN family (SURVEY.md §7.2).
  *
  * The quantizer stages used to be composed from per-centroid `VecDot`
  * expressions against `typedLit` arrays — semantically fine, but a
  * 16-centroid ranking over 64-dim vectors put 1,024 literal doubles in
  * the plan and a PQ encode/LUT pair put ~256 dot sub-trees; analysis +
  * Janino compilation of those trees cost seconds PER QUERY (measured
  * data-independent: `ann_ivfpq_topk` ran 11.4s cold / 2.3s warm at BOTH
  * sf0.01 and sf0.1). Each kernel here is ONE expression node whose
  * generated code calls a precompiled method — the plan shrinks by two
  * orders of magnitude and the inner loops run as JIT'd Scala instead of
  * giant Janino methods.
  *
  * Numeric contract (bit-identical to the expression-tree forms they
  * replace for FINITE inputs — differential-tested in
  * MatrixExpressionsSpec):
  *  - dots are strict ascending-index folds over min(|vec|, |row|)
  *    elements, like [[VectorExpressions.VecDot]];
  *  - normalization is x/sqrt(ascending Σx²), zero-norm passthrough,
  *    like the old `normalizedCol`;
  *  - all argmax/rank tie-breaks are lowest-index-first, like the old
  *    `array_sort` three-way comparator / `array_position` forms.
  *
  * NaN caveat: these kernels use Java IEEE comparisons (every `<`/`>`/
  * `>=` on NaN is false ⇒ NaN scores behave as ties / never win),
  * whereas Spark's comparison codegen is nanSafe (NaN orders GREATER
  * than everything, so the old trees ranked NaN scores first and set
  * `NaN >= 0` sign bits). A vector with NaN components therefore
  * buckets/ranks differently than under the replaced trees — a
  * deliberate simplification: embeddings are finite by contract, and
  * IEEE tie semantics are the less surprising behavior for the rows
  * that violate it.
  */
object MatrixExpressions {

  /** Indices of `mat`'s rows ranked by dot(vec, row) DESC, ties (and
    * NaN) row-index ASC — the centroid-ranking kernel. Ranking by raw
    * dot is order-equivalent to ranking by cosine: the vector's norm is
    * a per-row positive constant (zero-norm makes every score a tie
    * either way). Ulp-level caveat: the old form divided each dot by
    * the norm BEFORE comparing, so two dots within ~1 ulp could
    * collapse to an exact tie there (then tie-break by index) while the
    * raw dots stay strictly ordered here. */
  case class MatRank(child: Expression, mat: Array[Array[Double]])
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(ArrayType(DoubleType))
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    def compute(a: ArrayData): ArrayData = {
      val m = mat.length
      val dots = new Array[Double](m)
      var c = 0
      while (c < m) {
        val row = mat(c)
        val n = math.min(a.numElements(), row.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += a.getDouble(i) * row(i); i += 1 }
        dots(c) = s
        c += 1
      }
      // insertion sort, ascending k: shifting ONLY on strictly-smaller
      // keeps equal/NaN dots in index order (stable, first-wins)
      val idx = new Array[Int](m)
      var k = 0
      while (k < m) {
        var pos = k
        while (pos > 0 && dots(idx(pos - 1)) < dots(k)) {
          idx(pos) = idx(pos - 1); pos -= 1
        }
        idx(pos) = k
        k += 1
      }
      UnsafeArrayData.fromPrimitiveArray(idx)
    }
    override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode = {
      val ref = ctx.addReferenceObj("matRank", this, classOf[MatRank].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** First `n` indices of [[MatRank]]'s ranking — the probe-selection
    * kernel (IVF/IVFADC queries pick their nprobe nearest centroids):
    * a bounded stable insertion keeps only n entries, so per-row cost
    * is O(m·(dim + n)) instead of the full ranking's O(m·dim + m²) —
    * the difference between affordable and quadratic probe selection at
    * nlist ≈ √n codebooks. Ties: lowest index first, identical to
    * MatRank (stable, shift only on strictly-smaller). NaN caveat as
    * [[MatArgmax]]: finite dots match MatRank's prefix exactly
    * (differential-tested); mixed NaN/finite dots may differ (MatRank's
    * insertion lets an earlier NaN block later greater dots). */
  case class MatTopN(child: Expression, mat: Array[Array[Double]], n: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(ArrayType(DoubleType))
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    def compute(a: ArrayData): ArrayData = {
      val m = mat.length
      val cap = math.max(math.min(n, m), 0)
      val idx = new Array[Int](cap)
      val kd = new Array[Double](cap)
      var size = 0
      var c = 0
      while (c < m) {
        val row = mat(c)
        val len = math.min(a.numElements(), row.length)
        var s = 0.0
        var i = 0
        while (i < len) { s += a.getDouble(i) * row(i); i += 1 }
        if (size < cap) {
          var pos = size
          while (pos > 0 && kd(pos - 1) < s) {
            kd(pos) = kd(pos - 1); idx(pos) = idx(pos - 1); pos -= 1
          }
          kd(pos) = s; idx(pos) = c; size += 1
        } else if (cap > 0 && kd(cap - 1) < s) {
          var pos = cap - 1
          while (pos > 0 && kd(pos - 1) < s) {
            kd(pos) = kd(pos - 1); idx(pos) = idx(pos - 1); pos -= 1
          }
          kd(pos) = s; idx(pos) = c
        }
        c += 1
      }
      UnsafeArrayData.fromPrimitiveArray(idx)
    }
    override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode = {
      val ref = ctx.addReferenceObj("matTopN", this,
        classOf[MatTopN].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Index of `mat`'s row maximizing dot(vec, row) — the rank-1 slice
    * of [[MatRank]] without the O(m²) ranking sort, for the frames that
    * only need an ASSIGNMENT (IVF/SemDeDup corpus rows, the distributed
    * Lloyd loop): cost O(m·dim) per row, which is what makes
    * nlist ≈ √n codebooks affordable. Ties: lowest index first, same as
    * MatRank's stable order. NaN caveat beyond the header note: a NaN
    * dot never wins here (Java `>` is false), while MatRank's insertion
    * sort lets an EARLIER NaN block later greater dots — mixed
    * NaN/finite dots can thus pick different rows; finite inputs (the
    * embedding contract) are identical, differential-tested. */
  case class MatArgmax(child: Expression, mat: Array[Array[Double]])
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(ArrayType(DoubleType))
    override def dataType: DataType = IntegerType
    def compute(a: ArrayData): Int = {
      var best = 0
      var bestDot = Double.NegativeInfinity
      var c = 0
      while (c < mat.length) {
        val row = mat(c)
        val n = math.min(a.numElements(), row.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += a.getDouble(i) * row(i); i += 1 }
        if (s > bestDot) { bestDot = s; best = c }
        c += 1
      }
      best
    }
    override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode = {
      val ref = ctx.addReferenceObj("matArgmax", this,
        classOf[MatArgmax].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** PQ code array: L2-normalize the vector, then per subspace `m` the
    * argmax over codebook `m` of (dot(sub, cent) − ½‖cent‖²) ⇔ argmin
    * L2, ties lowest code. Biases are precomputed once per plan. */
  case class PqEncode(child: Expression,
      books: Array[Array[Array[Double]]], dsub: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(ArrayType(DoubleType))
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    @transient private lazy val biases: Array[Array[Double]] =
      books.map(_.map(cent => 0.5 * cent.map(x => x * x).sum))
    def compute(a: ArrayData): ArrayData = {
      val v = normalized(a)
      val codes = new Array[Int](books.length)
      var m = 0
      while (m < books.length) {
        val book = books(m)
        val bias = biases(m)
        val off = m * dsub
        var best = 0
        var bestScore = Double.NegativeInfinity
        var c = 0
        while (c < book.length) {
          val sc = subDot(v, off, dsub, book(c)) - bias(c)
          if (sc > bestScore) { bestScore = sc; best = c }
          c += 1
        }
        codes(m) = best
        m += 1
      }
      UnsafeArrayData.fromPrimitiveArray(codes)
    }
    override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode = {
      val ref = ctx.addReferenceObj("pqEnc", this, classOf[PqEncode].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Query-side flat ADC lookup table: L2-normalize, then entry
    * offsets(m)+c = dot(sub_m, book_m(c)). Offsets follow the ACTUAL
    * book sizes (distinct-slice seeding can leave books short). */
  case class PqLut(child: Expression,
      books: Array[Array[Array[Double]]], dsub: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(ArrayType(DoubleType))
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    def compute(a: ArrayData): ArrayData = {
      val v = normalized(a)
      val out = new Array[Double](books.map(_.length).sum)
      var p = 0
      var m = 0
      while (m < books.length) {
        val book = books(m)
        val off = m * dsub
        var c = 0
        while (c < book.length) {
          out(p) = subDot(v, off, dsub, book(c))
          p += 1; c += 1
        }
        m += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
    override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode = {
      val ref = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Sign-random-projection bucket id: bit `p` set iff
    * dot(vec, planes(p)) ≥ 0 (NaN dot ⇒ bit unset — Java IEEE `>=`;
    * see the header's NaN caveat). */
  case class SrpPack(child: Expression, planes: Array[Array[Double]])
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(ArrayType(DoubleType))
    override def dataType: DataType = LongType
    def compute(a: ArrayData): Long = {
      var r = 0L
      var p = 0
      while (p < planes.length) {
        val row = planes(p)
        val n = math.min(a.numElements(), row.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += a.getDouble(i) * row(i); i += 1 }
        if (s >= 0) r |= 1L << p
        p += 1
      }
      r
    }
    override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode = {
      val ref = ctx.addReferenceObj("srp", this, classOf[SrpPack].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Centered matrix-vector projection: y_r = Σ_i (x_i − mean_i)·M(r,i)
    * — the PCA transform kernel (rows of `mat` are principal
    * components). One expression node instead of k VecDot sub-trees
    * against typedLit arrays (same Janino-cost rationale as the header
    * note). Dots are strict ascending-index folds clamped to
    * min(|vec|, |mean|, |row|). */
  case class MatProject(child: Expression, mean: Array[Double],
      mat: Array[Array[Double]])
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(ArrayType(DoubleType))
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    def compute(a: ArrayData): ArrayData = {
      val k = mat.length
      val out = new Array[Double](k)
      var r = 0
      while (r < k) {
        val row = mat(r)
        val n = math.min(math.min(a.numElements(), mean.length), row.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += (a.getDouble(i) - mean(i)) * row(i); i += 1 }
        out(r) = s
        r += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
    override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode = {
      val ref = ctx.addReferenceObj("matProject", this,
        classOf[MatProject].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Ascending-index dot of v[off, off+dsub) against `cent`, clamped to
    * both lengths — the fold `vecDot(slice(v, off+1, dsub), cent)`
    * performed. */
  private def subDot(v: Array[Double], off: Int, dsub: Int,
      cent: Array[Double]): Double = {
    val len = math.min(math.min(dsub, math.max(v.length - off, 0)),
      cent.length)
    var d = 0.0
    var j = 0
    while (j < len) { d += v(off + j) * cent(j); j += 1 }
    d
  }

  /** Copy-out + L2-normalize (zero-norm passthrough), the exact
    * arithmetic of the old `normalizedCol`. */
  private def normalized(a: ArrayData): Array[Double] = {
    val dim = a.numElements()
    val v = new Array[Double](dim)
    var s = 0.0
    var i = 0
    while (i < dim) { val x = a.getDouble(i); v(i) = x; s += x * x; i += 1 }
    val n = math.sqrt(s)
    if (n != 0) { i = 0; while (i < dim) { v(i) /= n; i += 1 } }
    v
  }

  /** IVF fixed-codebook assignment on the 6dp DETERMINISM contract —
    * the kernel form of the `when`-chain Similarity.ivfAssignFixed
    * composed from per-anchor typedLit structs (O(nlist) plan nodes;
    * at production nlist ≈ √n the PLAN became the bottleneck — the
    * exact literal-array pattern this file exists to eliminate).
    * Unlike the raw-dot kernels above, the comparison key is
    * round(cos, 6): the oracle contract ranks the ROUNDED cosine
    * (ties to the smallest list id), so the quotient and rounding
    * must happen per anchor BEFORE the max. Bit-identity with the
    * chain (differential-tested in MatrixExpressionsSpec):
    *  - dot = strict ascending fold (VecDot's contract);
    *  - vnorm = sqrt(ascending Σx²), same as the prep column; the
    *    caller still excludes zero-norm rows (no defined similarity);
    *  - anchor norms precomputed with the same scala fold the old
    *    code ran per plan;
    *  - round = scala BigDecimal HALF_UP at scale 6 — exactly
    *    Spark Round's double path (java BigDecimal.valueOf);
    *  - strict `>` keeps the earlier (smaller-list) anchor on ties,
    *    identical to the chain's when(s.c > acc.c). */
  case class IvfAssign6(child: Expression, mat: Array[Array[Double]],
      lists: Array[Long])
      extends UnaryExpression with ImplicitCastInputTypes {
    require(mat.nonEmpty && mat.length == lists.length,
      s"IvfAssign6: ${mat.length} anchors vs ${lists.length} lists")
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(ArrayType(DoubleType))
    override def dataType: DataType = org.apache.spark.sql.types
      .StructType(Seq(
        org.apache.spark.sql.types.StructField("list",
          LongType, nullable = false),
        org.apache.spark.sql.types.StructField("cos_r",
          DoubleType, nullable = false)))
    @transient private lazy val anorms: Array[Double] =
      mat.map(row => math.sqrt(row.map(x => x * x).sum))
    private def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    def compute(a: ArrayData)
        : org.apache.spark.sql.catalyst.InternalRow = {
      val n = a.numElements()
      var nsq = 0.0
      var i = 0
      while (i < n) { val x = a.getDouble(i); nsq += x * x; i += 1 }
      val vn = math.sqrt(nsq)
      var best = 0
      var bestC = Double.NegativeInfinity
      var c = 0
      while (c < mat.length) {
        val row = mat(c)
        val len = math.min(n, row.length)
        var s = 0.0
        var j = 0
        while (j < len) { s += a.getDouble(j) * row(j); j += 1 }
        val cr = round6(s / (vn * anorms(c)))
        if (cr > bestC) { bestC = cr; best = c }
        c += 1
      }
      new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](lists(best), bestC))
    }
    override def nullSafeEval(a: Any): Any =
      compute(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode = {
      val ref = ctx.addReferenceObj("ivfAssign6", this,
        classOf[IvfAssign6].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def ivfAssign6(vec: Column, mat: Array[Array[Double]],
      lists: Array[Long]): Column =
    GraftShim.column(IvfAssign6(GraftShim.expression(vec), mat, lists))

  /** The first `n` lists of [[IvfAssign6]]'s ranking — deterministic
    * MULTI-probe selection on the same 6dp contract: per anchor
    * round(cos, 6), ranked DESC with ties to the SMALLEST list id
    * (stable bounded insertion, shift only on strictly-greater — the
    * array form of IvfAssign6's strict `>`), emitted as an array of
    * (list, cos_r) structs in probe order. n = 1 reproduces
    * IvfAssign6's pick exactly (differential-pinned). */
  case class IvfProbe6(child: Expression, mat: Array[Array[Double]],
      lists: Array[Long], n: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(mat.nonEmpty && mat.length == lists.length && n >= 1,
      s"IvfProbe6: ${mat.length} anchors, ${lists.length} lists, n=$n")
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(ArrayType(DoubleType))
    override def dataType: DataType = ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("list",
          LongType, nullable = false),
        org.apache.spark.sql.types.StructField("cos_r",
          DoubleType, nullable = false))), containsNull = false)
    @transient private lazy val anorms: Array[Double] =
      mat.map(row => math.sqrt(row.map(x => x * x).sum))
    private def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    def compute(a: ArrayData): ArrayData = {
      val len0 = a.numElements()
      var nsq = 0.0
      var i = 0
      while (i < len0) { val x = a.getDouble(i); nsq += x * x; i += 1 }
      val vn = math.sqrt(nsq)
      val m = mat.length
      val cap = math.min(n, m)
      val kd = new Array[Double](cap)
      val ki = new Array[Int](cap)
      var size = 0
      var c = 0
      while (c < m) {
        val row = mat(c)
        val dl = math.min(len0, row.length)
        var s = 0.0
        var j = 0
        while (j < dl) { s += a.getDouble(j) * row(j); j += 1 }
        val cr = round6(s / (vn * anorms(c)))
        if (size < cap) {
          var pos = size
          while (pos > 0 && kd(pos - 1) < cr) {
            kd(pos) = kd(pos - 1); ki(pos) = ki(pos - 1); pos -= 1
          }
          kd(pos) = cr; ki(pos) = c; size += 1
        } else if (kd(cap - 1) < cr) {
          var pos = cap - 1
          while (pos > 0 && kd(pos - 1) < cr) {
            kd(pos) = kd(pos - 1); ki(pos) = ki(pos - 1); pos -= 1
          }
          kd(pos) = cr; ki(pos) = c
        }
        c += 1
      }
      val out = new Array[Any](size)
      var k = 0
      while (k < size) {
        out(k) = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](lists(ki(k)), kd(k)))
        k += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    override def nullSafeEval(a: Any): Any =
      compute(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode = {
      val ref = ctx.addReferenceObj("ivfProbe6", this,
        classOf[IvfProbe6].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def ivfProbe6(vec: Column, mat: Array[Array[Double]],
      lists: Array[Long], n: Int): Column =
    GraftShim.column(IvfProbe6(GraftShim.expression(vec), mat, lists, n))

  def matRank(vec: Column, mat: Array[Array[Double]]): Column =
    GraftShim.column(MatRank(GraftShim.expression(vec), mat))
  def matArgmax(vec: Column, mat: Array[Array[Double]]): Column =
    GraftShim.column(MatArgmax(GraftShim.expression(vec), mat))
  def matTopN(vec: Column, mat: Array[Array[Double]], n: Int): Column =
    GraftShim.column(MatTopN(GraftShim.expression(vec), mat, n))
  def pqEncode(vec: Column, books: Array[Array[Array[Double]]], dsub: Int)
      : Column =
    GraftShim.column(PqEncode(GraftShim.expression(vec), books, dsub))
  def pqLut(vec: Column, books: Array[Array[Array[Double]]], dsub: Int)
      : Column =
    GraftShim.column(PqLut(GraftShim.expression(vec), books, dsub))
  def srpPack(vec: Column, planes: Array[Array[Double]]): Column =
    GraftShim.column(SrpPack(GraftShim.expression(vec), planes))
  def matProject(vec: Column, mean: Array[Double],
      mat: Array[Array[Double]]): Column =
    GraftShim.column(MatProject(GraftShim.expression(vec), mean, mat))
}
