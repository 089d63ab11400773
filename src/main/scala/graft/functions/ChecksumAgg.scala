package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Order-independent row-set checksum — the custom `Aggregator[IN,BUF,OUT]`
  * planned in SURVEY.md §7.2: XOR of 60-bit row hashes, used by copy
  * verification to prove source↔dest chunk identity beyond count-only
  * equality (the reference verifies nothing after a write; its recovery
  * correctness rests on upsert idempotence alone, sync.go:215-232 — the
  * checksum is a deliberate strengthening).
  *
  * XOR is commutative/associative, so the result is independent of row
  * order and partitioning — safe under any Spark shuffle plan. The row
  * hash is the first 15 hex chars (60 bits) of md5 over a canonical
  * `concat_ws`-joined row string, so an external engine can reproduce it:
  * DuckDB `bit_xor(('0x'||substr(md5(s),1,15))::BIGINT)` matches
  * bit-for-bit.
  */
object ChecksumAgg extends Aggregator[String, Long, Long] {
  override def zero: Long = 0L
  override def reduce(buf: Long, md5hex: String): Long =
    if (md5hex == null) buf
    else buf ^ java.lang.Long.parseLong(md5hex.substring(0, 15), 16)
  override def merge(a: Long, b: Long): Long = a ^ b
  override def finish(r: Long): Long = r
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  /** The aggregator as an untyped aggregate function column. */
  lazy val udafColumn: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(ChecksumAgg, Encoders.STRING)

  /** Checksum over a canonical row string of `cols`, joined by `|` with
    * the separator and escape char escaped inside values (so ("a|b","c")
    * and ("a","b|c") hash differently) and SQL NULL rendered as a \u0001
    * sentinel distinct from any escaped text. DuckDB reproduces the
    * canonicalization with replace(replace(x, chr(92), chr(92)||chr(92)),
    * '|', chr(92)||'|') and coalesce(..., chr(1)||'null'). */
  def rowChecksum(cols: Seq[Column]): Column = {
    val canon = cols.map { c =>
      val esc = regexp_replace(
        regexp_replace(c.cast("string"), "\\\\", "\\\\\\\\"),
        "\\|", "\\\\|")
      coalesce(esc, lit("\u0001null"))
    }
    udafColumn(md5(concat_ws("|", canon: _*)))
  }
}
