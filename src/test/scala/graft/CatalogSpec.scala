package graft

import java.nio.file.{Files, Paths}

import graft.catalog.Catalog
import graft.model._
import graft.operators.SchemaReplicator
import org.scalatest.funsuite.AnyFunSuite

/** Catalog discovery + regex filtering + rename rewrite + DDL replication
  * per /root/reference/pkg/agent/hacluster.go:75-211 (FIXTURES.md §B.1). */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  def mkHierarchicalRoot(): String = {
    val root = Files.createTempDirectory("graft_cat").toString
    // db1/rp1: events measurement; db2/rp2: empty dir; _internal: skipped
    for (p <- Seq("db1/rp1", "db1/rp2", "db2/rpx", "_internal/monitor"))
      Files.createDirectories(Paths.get(root, p))
    val src = Paths.get(s"${SparkSpec.Sf0001}/events.parquet")
    val s = spark.read.parquet(src.toString)
    s.limit(10).write.mode("overwrite")
      .parquet(s"$root/db1/rp1/events.parquet")
    s.limit(10).write.mode("overwrite")
      .parquet(s"$root/db1/rp2/cpu.load.parquet") // dotted name quoting case
    root
  }

  test("flat root surfaces as default/autogen with all measurements") {
    val cat = new Catalog(spark)
    val schema = cat.getSchema(SparkSpec.Sf0001)
    assert(schema.map(_.name) == Seq("default"))
    val ms = schema.head.rps.head.measurements.map(_.name)
    assert(ms.contains("events") && ms.contains("lineitem"))
  }

  test("hierarchical root: dbs/rps/measurements discovered, _internal skipped") {
    val root = mkHierarchicalRoot()
    val cat = new Catalog(spark)
    assert(cat.databases(root) == Seq("db1", "db2"))
    val schema = cat.getSchema(root)
    val db1 = schema.find(_.name == "db1").get
    assert(db1.rps.map(_.name) == Seq("rp1", "rp2"))
    assert(db1.rps.head.isDefault)
    assert(db1.rps.head.measurements.map(_.name) == Seq("events"))
    assert(db1.rps(1).measurements.map(_.name) == Seq("cpu.load"))
  }

  test("regex filters prune at each level (hacluster.go:85-143)") {
    val root = mkHierarchicalRoot()
    val cat = new Catalog(spark)
    val onlyDb1 = cat.getSchema(root, dbRegex = "db1")
    assert(onlyDb1.map(_.name) == Seq("db1"))
    val onlyCpu = cat.getSchema(root, measRegex = "^cpu")
    assert(onlyCpu.flatMap(_.rps).flatMap(_.measurements).map(_.name)
      == Seq("cpu.load"))
  }

  test("field types inferred from parquet footer (SHOW FIELD KEYS analog)") {
    val cat = new Catalog(spark)
    val f = cat.fields(s"${SparkSpec.Sf0001}/events.parquet")
    assert(f("value").ftype == FieldType.Float)
    assert(f("event_id").ftype == FieldType.Integer)
    assert(f("event_type").ftype == FieldType.Str)
  }

  test("rename rewrite + schema replication create renamed dbs/rps") {
    val root = mkHierarchicalRoot()
    val dst = Files.createTempDirectory("graft_ddl").toString
    val cat = new Catalog(spark)
    val schema = cat.getSchema(root, dbRegex = "db1",
      newDb = "db1copy", newRp = "rpnew")
    val rep = new SchemaReplicator
    val created = rep.replicate(schema, dst)
    assert(created.contains(("db1copy", "rpnew"))) // renamed default RP
    assert(created.contains(("db1copy", "rp2")))   // non-default keeps name
    val meta = rep.readRpMeta(dst, "db1copy", "rpnew")
    assert(meta.exists(_.contains("\"default\":true")))
  }

  test("flat root of DIRECTORY-form parquet (df.write.parquet output) " +
    "is still flat — table dirs are not databases") {
    val root = Files.createTempDirectory("graft_flatdir").toString
    val s = spark.read.parquet(s"${SparkSpec.Sf0001}/events.parquet")
    s.limit(10).write.mode("overwrite").parquet(s"$root/events.parquet")
    s.limit(5).write.mode("overwrite").parquet(s"$root/clicks.parquet")
    val cat = new Catalog(spark)
    assert(cat.databases(root) == Seq("default"))
    val schema = cat.getSchema(root)
    assert(schema.map(_.name) == Seq("default"))
    assert(schema.head.rps.head.measurements.map(_.name)
      == Seq("clicks", "events"))
  }

  test("registerViews exposes measurements to spark.sql with quoted " +
    "identifiers (F6; dotted names, client.go:90/README.md:395)") {
    import graft.functions.Identifiers
    val root = mkHierarchicalRoot()
    val cat = new Catalog(spark)
    val views = cat.registerViews(root)
    assert(views.contains("db1_rp1_events"))
    assert(views.contains("db1_rp2_cpu.load")) // dot survives via quoting
    val n = spark.sql("SELECT count(*) AS n FROM `db1_rp2_cpu.load`")
      .head().getLong(0)
    assert(n == 10)
    // quoting rules themselves
    assert(Identifiers.backquote("a`b") == "`a``b`")
    assert(Identifiers.influxQuote("cpu.load") == "\"cpu.load\"")
    assert(Identifiers.influxQuote("a\"b") == "\"a\\\"b\"")
  }
}
