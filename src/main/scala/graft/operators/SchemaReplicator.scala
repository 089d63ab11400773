package graft.operators

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.model._

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
  * Pure driver-side code; no Spark jobs (SURVEY.md §3.3).
  */
final class SchemaReplicator {

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
        val dir = Paths.get(dstRoot, dbName, rpName)
        Files.createDirectories(dir)
        Files.write(dir.resolve("_rp.json"),
          rpMetaJson(rp.copy(name = rpName)).getBytes(StandardCharsets.UTF_8))
        (dbName, rpName)
      }
    }

  /** Read back an RP's metadata (very small, driver-side). */
  def readRpMeta(dstRoot: String, db: String, rp: String): Option[String] = {
    val f = new File(s"$dstRoot/$db/$rp/_rp.json")
    if (f.exists()) Some(new String(Files.readAllBytes(f.toPath),
      StandardCharsets.UTF_8))
    else None
  }
}
