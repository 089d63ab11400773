package graft

import graft.model.{FieldSch, FieldType}
import graft.sources.LineProtocol
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Line-protocol codec: encode/parse round-trip with escapes, quotes,
  * nulls, and the full typed-decode coercion matrix of the reference
  * (/root/reference/pkg/agent/client.go:430-459), incl. the uint64 edge
  * above Long.MaxValue (client.go:447-452; SURVEY.md §7.3 hard part 5).
  */
class LineProtocolSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def sample[A](g: Gen[A]): A =
    Iterator.continually(g.sample).flatten.next()

  val schema = StructType(Seq(
    StructField("host", StringType),
    StructField("dc", StringType),
    StructField("f_float", DoubleType),
    StructField("f_int", LongType),
    StructField("f_uint", DecimalType(20, 0)),
    StructField("f_bool", BooleanType),
    StructField("f_str", StringType),
    StructField("time_ns", LongType)))

  val fields = Map(
    "f_float" -> FieldSch("f_float", FieldType.Float),
    "f_int" -> FieldSch("f_int", FieldType.Integer),
    "f_uint" -> FieldSch("f_uint", FieldType.Unsigned),
    "f_bool" -> FieldSch("f_bool", FieldType.Bool),
    "f_str" -> FieldSch("f_str", FieldType.Str))

  def enc(rows: Seq[Row]): Seq[String] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    LineProtocol.encode(df, "m1", Seq("host", "dc"), fields,
      "time_ns").collect().map(_.getString(0)).toSeq
  }

  test("encode renders every type with its wire form, tags sorted") {
    val big = new java.math.BigDecimal("18446744073709551615") // uint64 max
    val lines = enc(Seq(Row("h1", "dc 1", 1.5, 7L, big, true,
      "say \"hi\"", 123L)))
    assert(lines == Seq(
      "m1,dc=dc\\ 1,host=h1 " +
        "f_bool=true,f_float=1.5,f_int=7i," +
        "f_str=\"say \\\"hi\\\"\",f_uint=18446744073709551615u 123"))
  }

  test("null tags are omitted; null fields dropped; all-null-field rows " +
    "produce no line (client.go:428-429 semantics)") {
    val lines = enc(Seq(
      Row(null, null, 2.0, null, null, null, null, 5L),
      Row("h", null, null, null, null, null, null, 6L))) // all fields null
    assert(lines == Seq("m1 f_float=2.0 5"))
  }

  test("parseLine inverts encode incl. escapes and quoted spaces") {
    val p = LineProtocol.parseLine(
      "m\\ 1,host=h\\=x,a=b\\,c f_str=\"a b \\\"q\\\" \\\\\",f_int=3i 99")
    assert(p.measurement == "m 1")
    assert(p.tags == Map("host" -> "h=x", "a" -> "b,c"))
    assert(p.fields == Map("f_str" -> "a b \"q\" \\", "f_int" -> "3i"))
    assert(p.timeNs == 99L)
  }

  test("decodeTyped applies the full coercion matrix incl. uint64 > " +
    "Long.MaxValue (client.go:430-459, 447-452)") {
    val big = new java.math.BigDecimal("18446744073709551615")
    val rows = Seq(
      Row("h1", "d1", 1.25, -42L, big, true, "x y", 11L),
      Row("h2", null, null, 9L, new java.math.BigDecimal(3), false,
        "q\"z\\w", 12L))
    val encoded = enc(rows)
    val linesDf = spark.createDataFrame(
      spark.sparkContext.parallelize(encoded.map(Row(_))),
      StructType(Seq(StructField("line", StringType))))
    val decoded = LineProtocol.decodeTyped(linesDf, "line",
      Seq("host", "dc"), fields).orderBy("time_ns").collect()

    assert(decoded.length == 2)
    val r1 = decoded(0)
    assert(r1.getAs[String]("measurement") == "m1")
    assert(r1.getAs[String]("tag_host") == "h1")
    assert(r1.getAs[String]("tag_dc") == "d1")
    assert(r1.getAs[Double]("f_float") == 1.25)
    assert(r1.getAs[Long]("f_int") == -42L)
    assert(r1.getAs[java.math.BigDecimal]("f_uint")
      .compareTo(big) == 0) // full uint64 range survives
    assert(r1.getAs[Boolean]("f_bool"))
    assert(r1.getAs[String]("f_str") == "x y")
    assert(r1.getAs[Long]("time_ns") == 11L)
    val r2 = decoded(1)
    assert(r2.getAs[String]("tag_dc") == null) // omitted tag → null
    assert(r2.isNullAt(r2.fieldIndex("f_float"))) // dropped field → null
    assert(r2.getAs[String]("f_str") == "q\"z\\w")
    assert(!r2.getAs[Boolean]("f_bool"))
  }

  test("property: encode→parse round-trips arbitrary tag/field text") {
    // Tag values: no backslash — the line protocol never escapes
    // backslashes in tags, so a literal `\` adjacent to a delimiter is
    // ambiguous ON THE WIRE (a wart of the format itself, not of this
    // codec). String FIELD values are double-quoted with `\`/`"` escaped,
    // so they round-trip any content — backslashes go there.
    val tagTxt = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(',', '=', ' ', '"', '|')))
      .map(_.mkString).suchThat(_.nonEmpty)
    val strTxt = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(',', '=', ' ', '"', '\\', '|')))
      .map(_.mkString).suchThat(_.nonEmpty)
    // one batched encode for all cases (a per-case Spark job would make
    // the property run minutes, not seconds)
    val cases = (1 to 60).map { _ =>
      (sample(tagTxt), sample(strTxt), sample(Gen.choose(0L, Long.MaxValue)))
    }
    val lines = enc(cases.map { case (tagV, strV, ts) =>
      Row(tagV, null, null, null, null, null, strV, ts)
    })
    assert(lines.length == cases.length)
    cases.zip(lines).foreach { case ((tagV, strV, ts), line) =>
      val p = LineProtocol.parseLine(line)
      assert(p.measurement == "m1", line)
      assert(p.tags == Map("host" -> tagV), line)
      assert(p.fields("f_str") == strV, line)
      assert(p.timeNs == ts, line)
    }
  }

  test("every planted corrupt LP line individually fails parseLineOpt " +
    "(a scanner change that accepts one must fail here, not the gate)") {
    for (l <- graft.queries.ParityQueries.CorruptLpLines)
      assert(graft.sources.LineProtocol.parseLineOpt(l).isEmpty, l)
  }

  test("decodeTypedQuarantined: clean lines decode typed, malformed " +
    "lines keep raw bytes with null data, blanks drop, none lost") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val good = Seq(
      "m,t=a v=1i 1000",
      "m,t=b v=2i 2000")
    val lines = (good ++ Seq("", "   ") ++
      graft.queries.ParityQueries.CorruptLpLines).toDF("line")
    val out = graft.sources.LineProtocol.decodeTypedQuarantined(
      lines, "line", Seq("t"),
      Map("v" -> graft.model.FieldSch("v",
        graft.model.FieldType.Integer)))
    // blanks dropped; every other line present exactly once
    assert(out.count() ==
      good.size + graft.queries.ParityQueries.CorruptLpLines.size)
    val clean = out.filter(col("_corrupt_record").isNull).collect()
    assert(clean.map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet == Set(("a", 1L, 1000L), ("b", 2L, 2000L)))
    val bad = out.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.map(_.getString(4)).toSet ==
      graft.queries.ParityQueries.CorruptLpLines.toSet)
    assert(bad.forall(r => r.isNullAt(2) && r.isNullAt(3)))
  }

  test("boolean wire literals accepted: t/T/true/True/TRUE and f forms") {
    for ((s, want) <- Seq("t" -> true, "T" -> true, "true" -> true,
      "True" -> true, "TRUE" -> true, "f" -> false, "F" -> false,
      "false" -> false, "False" -> false, "FALSE" -> false)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(s"m f_bool=$s 1"))),
        StructType(Seq(StructField("line", StringType))))
      val out = LineProtocol.decodeTyped(df, "line", Nil,
        Map("f_bool" -> FieldSch("f_bool", FieldType.Bool))).collect()
      assert(out.head.getAs[Boolean]("f_bool") == want, s"literal $s")
    }
  }
}
