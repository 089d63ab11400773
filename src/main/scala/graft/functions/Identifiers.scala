package graft.functions

/** Identifier quoting for generated SQL — F6 in SURVEY.md §2.8.
  *
  * The reference wraps every db/rp/measurement name in double quotes when
  * building InfluxQL (`"%v"` at /root/reference/pkg/agent/client.go:90,
  * 112,137,239 and sync.go:162) because measurement names may contain
  * dots/dashes/spaces (README.md:395 shows `cpu.*`). The engine's SQL
  * surface is Spark SQL, whose quote character is the backtick; the
  * InfluxQL form is kept for emitting queries against a real InfluxDB.
  */
object Identifiers {

  /** Spark SQL identifier: backtick-quoted, embedded backticks doubled. */
  def backquote(id: String): String =
    "`" + id.replace("`", "``") + "`"

  /** InfluxQL identifier: double-quoted, embedded quotes escaped —
    * byte-for-byte what the reference emits (client.go:90). */
  def influxQuote(id: String): String =
    "\"" + id.replace("\"", "\\\"") + "\""
}
