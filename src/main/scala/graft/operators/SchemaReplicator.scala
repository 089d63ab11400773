package graft.operators

import java.nio.charset.StandardCharsets

import graft.model._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Catalog/DDL replication — the `-action replicaschema` analog
  * (/root/reference/pkg/agent/agent.go:147-174 →
  * hacluster.go:165-211 `ReplicateSchema`).
  *
  * Reference behavior reproduced:
  *  - per database: create the target db with its default RP
  *    (`CreateDB`, client.go:84-108), applying `-newdb`/`-newrp` renames;
  *  - per non-default RP: create it (`CreateRP`, client.go:110-133);
  *  - default flag maintained (`SetDefaultRP`, client.go:135-156);
  *  - `_internal` never created (client.go:86-88);
  *  - only the default RP can be renamed (README.md:259-261).
  *
  * Engine mapping: a filesystem catalog `root/<db>/<rp>/` with a
  * `_rp.json` metadata file per RP carrying retention properties — the
  * moral equivalent of `CREATE TABLE ... TBLPROPERTIES(retention=...)`.
  * Pure driver-side code; no Spark jobs (SURVEY.md §3.3). All filesystem
  * ops go through the Hadoop FileSystem API so DDL works against any
  * storage URI (local/HDFS/S3A); pass the session's Hadoop conf
  * (`spark.sessionState.newHadoopConf()`) to inherit its filesystem
  * settings.
  */
final class SchemaReplicator(conf: Configuration = new Configuration()) {

  private def fsFor(path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(conf), p)
  }

  def rpMetaJson(rp: RetentionPolicy): String =
    s"""{"name":"${rp.name}","duration_ns":${rp.durationNs},""" +
      s""""shard_group_duration_ns":${rp.shardGroupDurationNs},""" +
      s""""n_replicas":${rp.nReplicas},"default":${rp.isDefault}}"""

  /** ReplicateSchema: create every (db, rp) under dstRoot. Returns the
    * created (db, rp) pairs in creation order. */
  def replicate(schema: Seq[DbSchema], dstRoot: String): Seq[(String, String)] =
    schema.filter(_.name != "_internal").flatMap { db =>
      val dbName = db.targetName
      db.rps.map { rp =>
        val rpName =
          if (rp.isDefault && db.newDefaultRp.nonEmpty) db.newDefaultRp
          else rp.name // non-default RPs keep their name (README.md:259-261)
        val (fs, dir) = fsFor(s"$dstRoot/$dbName/$rpName")
        fs.mkdirs(dir)
        val out = fs.create(new Path(dir, "_rp.json"), true)
        try out.write(rpMetaJson(rp.copy(name = rpName))
          .getBytes(StandardCharsets.UTF_8))
        finally out.close()
        (dbName, rpName)
      }
    }

  /** Read back an RP's metadata (very small, driver-side). */
  def readRpMeta(dstRoot: String, db: String, rp: String): Option[String] = {
    val (fs, p) = fsFor(s"$dstRoot/$db/$rp/_rp.json")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        Some(new String(bytes, StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  /** Parse `_rp.json` back into the model (inverse of [[rpMetaJson]]).
    * Regex field capture like CqService — the records are flat,
    * engine-written JSON. */
  def readRp(root: String, db: String, rp: String): Option[RetentionPolicy] =
    readRpMeta(root, db, rp).map { json =>
      def l(k: String): Long =
        s""""$k":(-?\\d+)""".r.findFirstMatchIn(json)
          .map(_.group(1).toLong).getOrElse(0L)
      RetentionPolicy(
        s""""name":"((?:[^"\\\\]|\\\\.)*)"""".r.findFirstMatchIn(json)
          .map(_.group(1)).getOrElse(rp),
        l("duration_ns"), l("shard_group_duration_ns"),
        l("n_replicas").toInt,
        isDefault = json.contains(""""default":true"""))
    }

  private def writeRp(root: String, db: String, rp: RetentionPolicy): Unit = {
    val (fs, dir) = fsFor(s"$root/$db/${rp.name}")
    fs.mkdirs(dir)
    val out = fs.create(new Path(dir, "_rp.json"), true)
    try out.write(rpMetaJson(rp).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** RP directory names under a database (measurement dirs excluded). */
  def listRps(root: String, db: String): Seq[String] = {
    val (fs, p) = fsFor(s"$root/$db")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).filterNot(_.endsWith(".parquet")).sorted
  }

  /** Only one RP per database may carry the default flag; flip it to
    * `name` and clear every other RP's flag (SetDefaultRP semantics,
    * client.go:135-156). */
  private def setDefaultExclusive(root: String, db: String,
      name: String): Unit =
    listRps(root, db).foreach { other =>
      readRp(root, db, other).foreach { meta =>
        val want = other == name
        if (meta.isDefault != want)
          writeRp(root, db, meta.copy(isDefault = want))
      }
    }

  /** `CREATE DATABASE "db" [WITH …]` (client.go:84-108). Creates the
    * database with its default RP (NAME or "autogen"). Idempotent like
    * InfluxDB 1.x: re-creating an existing database is a silent no-op
    * that does NOT alter the existing RP set. `_internal` is never
    * created (client.go:86-88). Returns true iff newly created. */
  def createDatabase(root: String, db: String,
      rp: RetentionPolicy = RetentionPolicy("autogen", 0L, 0L, 1,
        isDefault = true)): Boolean = {
    if (db == "_internal") return false
    val (fs, dbDir) = fsFor(s"$root/$db")
    if (fs.exists(dbDir)) false
    else {
      writeRp(root, db, rp.copy(isDefault = true))
      true
    }
  }

  /** `CREATE RETENTION POLICY "rp" ON "db" …` (client.go:110-133).
    * The database must exist; duplicate RP names are refused (InfluxDB
    * errors unless the attributes are identical — we pin strict). */
  def createRp(root: String, db: String, rp: RetentionPolicy): Unit = {
    val (fs, dbDir) = fsFor(s"$root/$db")
    require(fs.exists(dbDir), s"database not found: $db")
    require(readRp(root, db, rp.name).isEmpty,
      s"retention policy already exists: ${rp.name}")
    writeRp(root, db, rp)
    if (rp.isDefault) setDefaultExclusive(root, db, rp.name)
  }

  /** `ALTER RETENTION POLICY "rp" ON "db" [DURATION d] [REPLICATION n]
    * [SHARD DURATION d] [DEFAULT]` (client.go:135-156 emits the
    * DEFAULT-only form). Unset clauses keep their stored values. */
  def alterRp(root: String, db: String, name: String,
      durationNs: Option[Long] = None, replication: Option[Int] = None,
      shardDurationNs: Option[Long] = None,
      default: Boolean = false): RetentionPolicy = {
    val cur = readRp(root, db, name).getOrElse(
      throw new IllegalArgumentException(
        s"retention policy not found: $name on $db"))
    val next = cur.copy(
      durationNs = durationNs.getOrElse(cur.durationNs),
      shardGroupDurationNs =
        shardDurationNs.getOrElse(cur.shardGroupDurationNs),
      nReplicas = replication.getOrElse(cur.nReplicas),
      isDefault = cur.isDefault || default)
    writeRp(root, db, next)
    if (default) setDefaultExclusive(root, db, name)
    next
  }

  /** `DROP DATABASE "db"` — recursive removal of the database tree.
    * Returns true iff it existed (InfluxDB 1.x errors on a missing
    * database; the /query plane surfaces false as that error). */
  def dropDatabase(root: String, db: String): Boolean = {
    val (fs, dbDir) = fsFor(s"$root/$db")
    fs.exists(dbDir) && fs.delete(dbDir, true)
  }
}
