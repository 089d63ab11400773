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
}
