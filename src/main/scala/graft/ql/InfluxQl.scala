package graft.ql

/** InfluxQL SELECT text front-end: tokenizer + AST + recursive-descent
  * parser for the query language the reference engine emits and its
  * users type (toni-moreno/syncflux pkg/agent/sync.go:162 emits
  * `select * from "m" where time > <s>s and time < <e>s group by *`;
  * README.md:395 filters measurements with patterns like `cpu.*`).
  *
  * Surface covered (the clause families the engine's SeriesOps /
  * aggregate surface already implements, now reachable from text):
  *   - SELECT *, bare field/tag names, and the InfluxQL function
  *     family COUNT/SUM/MEAN/MIN/MAX/MEDIAN/SPREAD/STDDEV/
  *     PERCENTILE(f, N)/FIRST/LAST, with optional `AS` aliases;
  *   - FROM a measurement: bare, `"quoted"` (dots/spaces legal inside
  *     quotes), dotted `db.rp.m` paths (last segment = measurement),
  *     or an unanchored `/regex/`;
  *   - WHERE: AND-chained comparisons on `time` (duration literals
  *     `1704412800s`, `5m`, `3h`, bare ns integers), on tags
  *     (= != =~ !~ with string/regex literals) and on fields
  *     (numeric comparisons);
  *   - GROUP BY: `*`, tag lists, `time(<duration>)`, and combinations;
  *   - FILL(null | none | previous | linear | <number>);
  *   - ORDER BY time [ASC|DESC], LIMIT/OFFSET, SLIMIT/SOFFSET.
  *
  * Parsing is deliberately strict: unknown trailing tokens, unknown
  * functions, and malformed clauses throw [[QlParseException]] with
  * the offending position — a silent partial parse would run a
  * DIFFERENT query than the user wrote.
  */
final class QlParseException(msg: String) extends RuntimeException(msg)

// ---------------------------------------------------------------- tokens

private sealed trait Tok
private object Tok {
  final case class Ident(name: String, quoted: Boolean) extends Tok
  final case class Str(v: String) extends Tok
  final case class Num(text: String) extends Tok
  final case class Dur(ns: Long) extends Tok
  final case class Re(pattern: String) extends Tok
  final case class Sym(s: String) extends Tok
  case object End extends Tok
}

private object QlLexer {
  private val unitNs: Map[String, Long] = Map(
    "ns" -> 1L, "u" -> 1000L, "µ" -> 1000L, "us" -> 1000L,
    "ms" -> 1000000L, "s" -> 1000000000L, "m" -> 60L * 1000000000L,
    "h" -> 3600L * 1000000000L, "d" -> 86400L * 1000000000L,
    "w" -> 7L * 86400L * 1000000000L)

  /** Unquoted keywords after which a `/` opens a REGEX literal (value
    * position); after anything value-ending — a number, duration,
    * quoted identifier, `)`, or any other bare identifier — `/` is
    * DIVISION. The same prev-token heuristic JS lexers use for the
    * identical ambiguity; InfluxQL resolves it with scanner modes. */
  private val RegexPosKw =
    Set("from", "where", "and", "or", "select")

  def lex(in: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var prev: Tok = null
    def emit(t: Tok): Unit = { prev = t; out += t }
    var i = 0
    val n = in.length
    def fail(msg: String) =
      throw new QlParseException(s"$msg at position $i in: $in")
    while (i < n) {
      val c = in(i)
      if (c.isWhitespace) { i += 1 }
      else if (c == '"') {
        val sb = new StringBuilder; i += 1
        var closed = false
        while (i < n && !closed) {
          if (in(i) == '"') {
            if (i + 1 < n && in(i + 1) == '"') { sb += '"'; i += 2 }
            else { closed = true; i += 1 }
          } else { sb += in(i); i += 1 }
        }
        if (!closed) fail("unterminated quoted identifier")
        emit(Tok.Ident(sb.toString, quoted = true))
      }
      else if (c == '\'') {
        val sb = new StringBuilder; i += 1
        var closed = false
        while (i < n && !closed) {
          if (in(i) == '\'') {
            if (i + 1 < n && in(i + 1) == '\'') { sb += '\''; i += 2 }
            else { closed = true; i += 1 }
          } else if (in(i) == '\\' && i + 1 < n) {
            sb += in(i + 1); i += 2
          } else { sb += in(i); i += 1 }
        }
        if (!closed) fail("unterminated string literal")
        emit(Tok.Str(sb.toString))
      }
      else if (c == '/') {
        val valueEnd = prev match {
          case Tok.Num(_) | Tok.Dur(_) => true
          case Tok.Ident(_, true)      => true
          case Tok.Ident(w, false)     => !RegexPosKw(w.toLowerCase)
          case Tok.Sym(")")            => true
          case _                       => false
        }
        if (valueEnd) { emit(Tok.Sym("/")); i += 1 }
        else {
          val sb = new StringBuilder; i += 1
          var closed = false
          while (i < n && !closed) {
            if (in(i) == '\\' && i + 1 < n && in(i + 1) == '/') {
              sb += '/'; i += 2
            } else if (in(i) == '/') { closed = true; i += 1 }
            else { sb += in(i); i += 1 }
          }
          if (!closed) fail("unterminated /regex/ literal")
          emit(Tok.Re(sb.toString))
        }
      }
      else if (c.isDigit) {
        val start = i
        while (i < n && in(i).isDigit) i += 1
        var isFloat = false
        if (i < n && in(i) == '.' && i + 1 < n && in(i + 1).isDigit) {
          isFloat = true; i += 1
          while (i < n && in(i).isDigit) i += 1
        }
        val numText = in.substring(start, i)
        val us = i
        while (i < n && (in(i).isLetter || in(i) == 'µ')) i += 1
        val unit = in.substring(us, i).toLowerCase
        if (unit.isEmpty) emit(Tok.Num(numText))
        else if (isFloat) fail(s"duration needs an integer count: $numText$unit")
        else unitNs.get(unit) match {
          case Some(ns) => emit(Tok.Dur(numText.toLong * ns))
          case None     => fail(s"unknown duration unit '$unit'")
        }
      }
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (in(i).isLetterOrDigit || in(i) == '_')) i += 1
        emit(Tok.Ident(in.substring(start, i), quoted = false))
      }
      else {
        val two = if (i + 1 < n) in.substring(i, i + 2) else ""
        if (Set("!=", "<>", "<=", ">=", "=~", "!~")(two)) {
          emit(Tok.Sym(two)); i += 2
        } else if ("(),*=<>.-+".indexOf(c) >= 0) {
          emit(Tok.Sym(c.toString)); i += 1
        } else fail(s"unexpected character '$c'")
      }
    }
    out += Tok.End
    out.result()
  }
}

// ------------------------------------------------------------------- AST

/** Any parsed InfluxQL statement: a SELECT or a SHOW. */
sealed trait QlStatement

/** The schema-discovery commands the reference issues over HTTP
  * (client.go:63 `show databases`, :188 `show retention policies on
  * "db"`, :239 `show field keys from "m"`, :273 `show measurements`)
  * plus SHOW TAG KEYS — routed onto [[graft.catalog.Catalog]]. */
sealed trait QlShow extends QlStatement
case object ShowDatabases extends QlShow
final case class ShowRetentionPolicies(db: Option[String]) extends QlShow
/** exact / =~ regex filter from `WITH MEASUREMENT = m` / `=~ /re/`. */
final case class ShowMeasurements(exact: Option[String],
    regex: Option[String]) extends QlShow
final case class ShowFieldKeys(from: Option[String]) extends QlShow
final case class ShowTagKeys(from: Option[String]) extends QlShow
/** SHOW TAG VALUES [FROM m] WITH KEY = "k" — the distinct values of
  * one tag across the measurements carrying it. */
final case class ShowTagValues(from: Option[String], key: String)
  extends QlShow
/** SHOW CONTINUOUS QUERIES — the registered CQ catalog
  * ([[CqService]]'s `_cq.json`). */
case object ShowContinuousQueries extends QlShow
/** SHOW SERIES [FROM m] — distinct series keys in InfluxDB's
  * `measurement,tag=value,...` line format (tag keys sorted). */
final case class ShowSeries(from: Option[String]) extends QlShow

/** DELETE FROM "m" [WHERE time < …] — the point-expiry statement;
  * v1 supports the retention idiom (time upper bound, or no WHERE =
  * everything), which maps onto the chunk-dropping expiry engine. */
final case class QlDelete(measurement: String, where: Seq[Seq[QlCond]])
  extends QlStatement

/** DROP MEASUREMENT "m" — remove the measurement's storage. */
final case class QlDropMeasurement(name: String) extends QlStatement

/** DROP CONTINUOUS QUERY "name" [ON "db"] — unregister from the CQ
  * catalog (the rollup data stays; DROP MEASUREMENT removes it). */
final case class QlDropCq(name: String, db: Option[String])
  extends QlStatement

/** CREATE CONTINUOUS QUERY "name" [ON "db"] BEGIN <select-into> END —
  * the InfluxDB CQ DDL; the inner SELECT must carry INTO and a
  * time() bucket (that is what a CQ is). */
final case class QlCreateCq(name: String, db: Option[String],
    inner: QlSelect) extends QlStatement

/** Retention-policy attribute bundle shared by the schema DDL
  * statements — the clauses the reference's replicaschema plane emits
  * verbatim (client.go:90 CREATE DATABASE … WITH DURATION …
  * REPLICATION … SHARD DURATION … NAME …; client.go:112 CREATE
  * RETENTION POLICY; client.go:137 ALTER … DEFAULT). `durationNs == 0`
  * is infinite retention (INF / Go's "0s"). */
final case class QlRpSpec(
    name: Option[String],
    durationNs: Option[Long],
    replication: Option[Int],
    shardDurationNs: Option[Long],
    default: Boolean)

/** CREATE DATABASE "db" [WITH [DURATION d] [REPLICATION n]
  * [SHARD DURATION d] [NAME "rp"]] — client.go:90's emitted shape. */
final case class QlCreateDatabase(name: String, rp: QlRpSpec)
  extends QlStatement

/** DROP DATABASE "db" — remove the database directory tree. */
final case class QlDropDatabase(name: String) extends QlStatement

/** CREATE RETENTION POLICY "rp" ON "db" DURATION d REPLICATION n
  * [SHARD DURATION d] [DEFAULT] — client.go:112's emitted shape. */
final case class QlCreateRp(name: String, db: String, spec: QlRpSpec)
  extends QlStatement

/** ALTER RETENTION POLICY "rp" ON "db" [DURATION d] [REPLICATION n]
  * [SHARD DURATION d] [DEFAULT] — client.go:137 emits the
  * DEFAULT-only form. */
final case class QlAlterRp(name: String, db: String, spec: QlRpSpec)
  extends QlStatement

sealed trait QlSource
/** Dotted measurement path; the LAST segment is the measurement
  * (db/rp prefixes are resolution hints the planner may ignore). */
final case class QlMeasurement(path: Seq[String]) extends QlSource
/** FROM m1, m2, … — a measurement list, unioned like a regex match
  * (heterogeneous schemas NULL-fill). */
final case class QlSourceList(names: Seq[String]) extends QlSource
/** Unanchored regex over measurement names (README.md:395 `cpu.*`). */
final case class QlSourceRegex(pattern: String) extends QlSource
/** FROM (SELECT …) — an InfluxQL subquery; the outer query reads the
  * inner result as a derived measurement. */
final case class QlSubquery(inner: QlSelect) extends QlSource

sealed trait QlProj
case object QlStar extends QlProj
final case class QlColumn(name: String) extends QlProj
/** fn(field[, arg]) — numeric arg used by PERCENTILE(f, N) and
  * MOVING_AVERAGE(f, N); duration arg (`argNs`) by DERIVATIVE /
  * ELAPSED units. `inner` carries the nested transform-of-aggregate
  * form `derivative(mean(v), 1h)` (the Grafana-default InfluxQL
  * shape): the outer fn is a transformation, the inner call an
  * aggregate, and the planner desugars the pair into the explicit
  * subquery plan; `field` then names the INNER call's field. */
final case class QlCall(fn: String, field: String, arg: Option[Double],
    argNs: Option[Long] = None, inner: Option[QlCall] = None,
    /** second numeric argument — HOLT_WINTERS(mean(f), N, S)'s
      * seasonal pattern length. */
    arg2: Option[Double] = None)
  extends QlProj

/** Arithmetic projection expression — `value * 2 + 1`,
  * `max(v) - min(v)` (the Grafana math-box surface). Operands are
  * numeric literals, bare field columns (raw queries), or function
  * calls (aggregate queries); InfluxQL refuses mixing raw fields with
  * aggregates and so do we. */
sealed trait QlAExpr
final case class ANum(v: Double) extends QlAExpr
final case class ACol(name: String) extends QlAExpr
final case class ACall(call: QlCall) extends QlAExpr
final case class ABin(op: String, l: QlAExpr, r: QlAExpr) extends QlAExpr
object QlAExpr {
  def hasCall(e: QlAExpr): Boolean = e match {
    case _: ACall      => true
    case ABin(_, l, r) => hasCall(l) || hasCall(r)
    case _             => false
  }
}
/** A computed projection (always needs an AS alias — InfluxQL's
  * auto-generated expression names are not reproduced). */
final case class QlExpr(e: QlAExpr) extends QlProj

final case class QlField(proj: QlProj, alias: Option[String])

sealed trait QlLit
final case class QlNum(v: Double, text: String) extends QlLit
final case class QlStr(v: String) extends QlLit
final case class QlDur(ns: Long) extends QlLit
final case class QlRe(pattern: String) extends QlLit
/** `now() ± duration` in a time predicate — resolved against the
  * caller's clock at PLAN time (the planner refuses without one: a
  * silently-wrong implicit clock is worse than an error). */
final case class QlNowOffset(deltaNs: Long) extends QlLit

/** One WHERE conjunct: `operand op literal`. */
final case class QlCond(operand: String, op: String, lit: QlLit)

sealed trait QlFill
case object FillNull extends QlFill
case object FillNone extends QlFill
case object FillPrevious extends QlFill
case object FillLinear extends QlFill
final case class FillValue(v: Double) extends QlFill

final case class QlSelect(
    fields: Seq[QlField],
    into: Option[String],
    source: QlSource,
    where: Seq[Seq[QlCond]],
    groupStar: Boolean,
    groupTags: Seq[String],
    timeBucketNs: Option[Long],
    timeOffsetNs: Long,
    fill: Option[QlFill],
    orderByTime: Boolean,
    orderDesc: Boolean,
    limit: Option[Int],
    offset: Option[Int],
    slimit: Option[Int],
    soffset: Option[Int],
    /** TZ('<zone>'): GROUP BY time() buckets align to wall-clock
      * boundaries in this IANA zone (DST-correct via java.time /
      * the engine's session-independent zone conversion). */
    tz: Option[String] = None) extends QlStatement {
  /** Call projections and expressions CONTAINING calls route to the
    * aggregate planner; call-free expressions (`value * 2`) are raw
    * per-row projections. */
  def hasAggregates: Boolean = fields.exists(f => f.proj match {
    case _: QlCall  => true
    case e: QlExpr  => QlAExpr.hasCall(e.e)
    case _          => false
  })
}

// ---------------------------------------------------------------- parser

object InfluxQl {

  /** The function family the planner implements; parse rejects others
    * loudly (a typo'd `maen(v)` must not silently project a column). */
  val Functions: Set[String] = Set("count", "sum", "mean", "min", "max",
    "median", "spread", "stddev", "percentile", "first", "last",
    "mode", "distinct", "integral", "sample", "holt_winters",
    "difference", "derivative", "non_negative_derivative",
    "cumulative_sum", "elapsed", "moving_average", "top", "bottom")

  def parse(text: String): QlSelect = new P(QlLexer.lex(text), text).select()

  /** Parse either statement form; SHOW commands route to the catalog
    * planner, SELECTs to the query planner. */
  def parseStatement(text: String): QlStatement = {
    val toks = QlLexer.lex(text)
    toks.headOption match {
      case Some(Tok.Ident(n, false)) if n.equalsIgnoreCase("show") =>
        new P(toks, text).show()
      case Some(Tok.Ident(n, false)) if n.equalsIgnoreCase("delete") =>
        new P(toks, text).delete()
      case Some(Tok.Ident(n, false)) if n.equalsIgnoreCase("drop") =>
        new P(toks, text).drop()
      case Some(Tok.Ident(n, false)) if n.equalsIgnoreCase("create") =>
        new P(toks, text).create()
      case Some(Tok.Ident(n, false)) if n.equalsIgnoreCase("alter") =>
        new P(toks, text).alterRp()
      case _ => new P(toks, text).select()
    }
  }

  private final class P(toks: Vector[Tok], src: String) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def fail(msg: String): Nothing =
      throw new QlParseException(s"$msg (token ${pos + 1}) in: $src")

    private def isKw(t: Tok, kw: String): Boolean = t match {
      case Tok.Ident(n, false) => n.equalsIgnoreCase(kw)
      case _                   => false
    }
    private def atKw(kw: String): Boolean = isKw(peek, kw)
    private def eatKw(kw: String): Unit =
      if (atKw(kw)) { pos += 1 } else fail(s"expected $kw")
    private def eatSym(s: String): Unit = next() match {
      case Tok.Sym(`s`) => ()
      case t            => fail(s"expected '$s', got $t")
    }
    private def ident(): (String, Boolean) = next() match {
      case Tok.Ident(n, q) => (n, q)
      case t               => fail(s"expected identifier, got $t")
    }

    def show(): QlShow = {
      eatKw("show")
      val (kind, _) = ident()
      val stmt: QlShow = kind.toLowerCase match {
        case "databases" => ShowDatabases
        case "retention" =>
          eatKw("policies")
          val db = if (atKw("on")) { pos += 1; Some(ident()._1) }
            else None
          ShowRetentionPolicies(db)
        case "measurements" =>
          if (atKw("with")) {
            pos += 1; eatKw("measurement")
            next() match {
              case Tok.Sym("=") =>
                ShowMeasurements(Some(ident()._1), None)
              case Tok.Sym("=~") => next() match {
                case Tok.Re(p) => ShowMeasurements(None, Some(p))
                case t => fail(s"=~ needs a /regex/, got $t")
              }
              case t => fail(s"WITH MEASUREMENT needs = or =~, got $t")
            }
          } else ShowMeasurements(None, None)
        case "field" =>
          eatKw("keys")
          ShowFieldKeys(
            if (atKw("from")) { pos += 1; Some(ident()._1) } else None)
        case "continuous" =>
          eatKw("queries")
          ShowContinuousQueries
        case "series" =>
          ShowSeries(
            if (atKw("from")) { pos += 1; Some(ident()._1) } else None)
        case "tag" =>
          if (atKw("values")) {
            pos += 1
            val from =
              if (atKw("from")) { pos += 1; Some(ident()._1) } else None
            eatKw("with"); eatKw("key"); eatSym("=")
            ShowTagValues(from, ident()._1)
          } else {
            eatKw("keys")
            ShowTagKeys(
              if (atKw("from")) { pos += 1; Some(ident()._1) } else None)
          }
        case other => fail(s"unsupported SHOW $other")
      }
      if (peek != Tok.End) fail(s"unexpected trailing token $peek")
      stmt
    }

    def select(): QlSelect = {
      val s = selectBody()
      if (peek != Tok.End) fail(s"unexpected trailing token $peek")
      s
    }

    def delete(): QlDelete = {
      eatKw("delete"); eatKw("from")
      val m = ident()._1
      val where =
        if (atKw("where")) { pos += 1; condList() } else Seq.empty
      if (peek != Tok.End) fail(s"unexpected trailing token $peek")
      QlDelete(m, where)
    }

    def drop(): QlStatement = {
      eatKw("drop")
      if (atKw("continuous")) {
        pos += 1; eatKw("query")
        val name = ident()._1
        val db = if (atKw("on")) { pos += 1; Some(ident()._1) } else None
        if (peek != Tok.End) fail(s"unexpected trailing token $peek")
        QlDropCq(name, db)
      } else if (atKw("database")) {
        pos += 1
        val name = ident()._1
        if (peek != Tok.End) fail(s"unexpected trailing token $peek")
        QlDropDatabase(name)
      } else {
        eatKw("measurement")
        val m = ident()._1
        if (peek != Tok.End) fail(s"unexpected trailing token $peek")
        QlDropMeasurement(m)
      }
    }

    def create(): QlStatement = {
      eatKw("create")
      if (atKw("continuous")) createCq()
      else if (atKw("database")) {
        pos += 1
        val name = ident()._1
        val spec =
          if (atKw("with")) { pos += 1; rpSpec(allowName = true) }
          else QlRpSpec(None, None, None, None, default = false)
        if (peek != Tok.End) fail(s"unexpected trailing token $peek")
        QlCreateDatabase(name, spec)
      } else if (atKw("retention")) {
        pos += 1; eatKw("policy")
        val name = ident()._1
        eatKw("on")
        val db = ident()._1
        val spec = rpSpec(allowName = false)
        // InfluxDB 1.x requires both on CREATE RP (DEFAULT optional)
        if (spec.durationNs.isEmpty)
          fail("CREATE RETENTION POLICY needs DURATION")
        if (spec.replication.isEmpty)
          fail("CREATE RETENTION POLICY needs REPLICATION")
        if (peek != Tok.End) fail(s"unexpected trailing token $peek")
        QlCreateRp(name, db, spec)
      } else fail("expected CONTINUOUS, DATABASE or RETENTION")
    }

    def alterRp(): QlAlterRp = {
      eatKw("alter"); eatKw("retention"); eatKw("policy")
      val name = ident()._1
      eatKw("on")
      val db = ident()._1
      val spec = rpSpec(allowName = false)
      if (spec.durationNs.isEmpty && spec.replication.isEmpty &&
        spec.shardDurationNs.isEmpty && !spec.default)
        fail("ALTER RETENTION POLICY needs at least one clause")
      if (peek != Tok.End) fail(s"unexpected trailing token $peek")
      QlAlterRp(name, db, spec)
    }

    /** The WITH/attribute tail of the schema DDL statements. Order-
      * insensitive like InfluxDB's parser; each clause at most once. */
    private def rpSpec(allowName: Boolean): QlRpSpec = {
      var dur: Option[Long] = None
      var rep: Option[Int] = None
      var shard: Option[Long] = None
      var nm: Option[String] = None
      var default = false
      var more = true
      while (more) {
        if (atKw("duration") && dur.isEmpty) {
          pos += 1; dur = Some(durationLit())
        } else if (atKw("replication") && rep.isEmpty) {
          pos += 1
          next() match {
            case Tok.Num(t) => rep = Some(t.toInt)
            case t          => fail(s"REPLICATION needs an integer, got $t")
          }
        } else if (atKw("shard") && shard.isEmpty) {
          pos += 1; eatKw("duration"); shard = Some(durationLit())
        } else if (allowName && atKw("name") && nm.isEmpty) {
          pos += 1; nm = Some(ident()._1)
        } else if (atKw("default") && !default) {
          pos += 1; default = true
        } else more = false
      }
      QlRpSpec(nm, dur, rep, shard, default)
    }

    /** A DDL duration: consecutive Dur tokens SUM (Go's
      * time.Duration.String() emits compound "168h0m0s" and the lexer
      * splits it into three Dur tokens); INF and bare 0 mean infinite
      * retention (durationNs = 0, client.go:24-38). */
    private def durationLit(): Long = peek match {
      case Tok.Ident(n, false) if n.equalsIgnoreCase("inf") =>
        pos += 1; 0L
      case Tok.Num("0") => pos += 1; 0L
      case Tok.Dur(_) =>
        var total = 0L
        while (peek.isInstanceOf[Tok.Dur])
          total += next().asInstanceOf[Tok.Dur].ns
        total
      case t => fail(s"expected a duration, got $t")
    }

    private def createCq(): QlCreateCq = {
      eatKw("continuous"); eatKw("query")
      val name = ident()._1
      val db = if (atKw("on")) { pos += 1; Some(ident()._1) } else None
      eatKw("begin")
      val inner = selectBody()
      eatKw("end")
      if (peek != Tok.End) fail(s"unexpected trailing token $peek")
      if (inner.into.isEmpty)
        fail("a continuous query's SELECT needs INTO")
      if (inner.timeBucketNs.isEmpty)
        fail("a continuous query's SELECT needs GROUP BY time(...)")
      QlCreateCq(name, db, inner)
    }

    private def selectBody(): QlSelect = {
      eatKw("select")
      val fields = fieldList()
      // INTO "dst" — the downsample-to-measurement clause (InfluxQL
      // SELECT INTO); dotted paths keep the last segment
      val into: Option[String] =
        if (atKw("into")) {
          pos += 1
          var path = Vector(ident()._1)
          while (peek == Tok.Sym(".")) { pos += 1; path :+= ident()._1 }
          Some(path.last)
        } else None
      eatKw("from")
      val source = fromSource()
      val where =
        if (atKw("where")) { pos += 1; condList() } else Seq.empty
      var groupStar = false
      var groupTags = Vector.empty[String]
      var bucket: Option[Long] = None
      var bucketOff: Long = 0L
      if (atKw("group")) {
        pos += 1; eatKw("by")
        var more = true
        while (more) {
          peek match {
            case Tok.Sym("*") => pos += 1; groupStar = true
            case Tok.Ident(n, false) if n.equalsIgnoreCase("time") =>
              pos += 1; eatSym("(")
              def dur(): Long = {
                val neg = peek == Tok.Sym("-")
                if (neg) pos += 1
                val v = next() match {
                  case Tok.Dur(ns) => ns
                  case Tok.Num(t) if !t.contains('.') => t.toLong
                  case t => fail(s"time() needs a duration, got $t")
                }
                if (neg) -v else v
              }
              bucket = Some(dur())
              // time(interval, offset): shifted bucket boundaries —
              // InfluxQL's two-argument form (negative offsets legal)
              if (peek == Tok.Sym(",")) { pos += 1; bucketOff = dur() }
              eatSym(")")
            case Tok.Ident(_, _) => groupTags :+= ident()._1
            case t => fail(s"bad GROUP BY item $t")
          }
          if (peek == Tok.Sym(",")) { pos += 1 } else more = false
        }
      }
      val fill: Option[QlFill] =
        if (atKw("fill")) {
          pos += 1; eatSym("(")
          val f = next() match {
            case Tok.Ident(n, false) if n.equalsIgnoreCase("null") => FillNull
            case Tok.Ident(n, false) if n.equalsIgnoreCase("none") => FillNone
            case Tok.Ident(n, false) if n.equalsIgnoreCase("previous") =>
              FillPrevious
            case Tok.Ident(n, false) if n.equalsIgnoreCase("linear") =>
              FillLinear
            case Tok.Num(t) => FillValue(t.toDouble)
            case t => fail(s"bad fill() argument $t")
          }
          eatSym(")")
          Some(f)
        } else None
      var orderByTime = false
      var orderDesc = false
      if (atKw("order")) {
        pos += 1; eatKw("by")
        val (n, _) = ident()
        if (!n.equalsIgnoreCase("time"))
          fail(s"InfluxQL only orders by time, got '$n'")
        orderByTime = true
        if (atKw("desc")) { pos += 1; orderDesc = true }
        else if (atKw("asc")) { pos += 1 }
      }
      def intClause(kw: String): Option[Int] =
        if (atKw(kw)) {
          pos += 1
          next() match {
            case Tok.Num(t) if !t.contains('.') => Some(t.toInt)
            case t => fail(s"$kw needs an integer, got $t")
          }
        } else None
      val limit = intClause("limit")
      val offset = intClause("offset")
      val slimit = intClause("slimit")
      val soffset = intClause("soffset")
      // TZ('<zone>') — last clause (InfluxQL grammar); zone names are
      // validated at plan time against the JVM's IANA database
      val tz: Option[String] =
        if (atKw("tz")) {
          pos += 1; eatSym("(")
          val z = next() match {
            case Tok.Str(v) => v
            case t => fail(s"tz() needs a quoted zone name, got $t")
          }
          eatSym(")")
          Some(z)
        } else None
      QlSelect(fields, into, source, where, groupStar, groupTags, bucket,
        bucketOff, fill,
        orderByTime, orderDesc, limit, offset, slimit, soffset, tz)
    }

    private def fieldList(): Seq[QlField] = {
      val fs = Vector.newBuilder[QlField]
      var more = true
      while (more) {
        fs += field()
        if (peek == Tok.Sym(",")) { pos += 1 } else more = false
      }
      fs.result()
    }

    private def field(): QlField = {
      val proj: QlProj = peek match {
        case Tok.Sym("*") => pos += 1; QlStar
        case _ => addExpr() match {
          // a single bare column / call keeps its first-class node
          // (the planners dispatch on them); only genuine arithmetic
          // becomes a QlExpr
          case ACol(nm)  => QlColumn(nm)
          case ACall(c)  => c
          case _: ANum   => fail("a bare numeric literal is not a " +
            "projection")
          case e         => QlExpr(e)
        }
      }
      val alias =
        if (atKw("as")) { pos += 1; Some(ident()._1) } else None
      QlField(proj, alias)
    }

    // ------------- projection arithmetic (value * 2, max(v) - min(v))
    private def addExpr(): QlAExpr = {
      var l = mulExpr()
      while (peek == Tok.Sym("+") || peek == Tok.Sym("-")) {
        val Tok.Sym(op) = next(): @unchecked
        l = ABin(op, l, mulExpr())
      }
      l
    }

    private def mulExpr(): QlAExpr = {
      var l = unaryExpr()
      while (peek == Tok.Sym("*") || peek == Tok.Sym("/")) {
        val Tok.Sym(op) = next(): @unchecked
        l = ABin(op, l, unaryExpr())
      }
      l
    }

    private def unaryExpr(): QlAExpr = peek match {
      case Tok.Sym("-") =>
        pos += 1
        unaryExpr() match {
          case ANum(v) => ANum(-v)
          case e       => ABin("-", ANum(0), e)
        }
      case _ => primaryExpr()
    }

    private def primaryExpr(): QlAExpr = peek match {
      case Tok.Sym("(") =>
        pos += 1
        val e = addExpr()
        eatSym(")")
        e
      case Tok.Num(t) => pos += 1; ANum(t.toDouble)
      case Tok.Ident(n, false) if toks(pos + 1) == Tok.Sym("(") =>
        ACall(parseCall(n))
      case Tok.Ident(_, _) => ACol(ident()._1)
      case t => fail(s"bad select expression token $t")
    }

    /** fn(field[, arg]) incl. the nested transform-of-aggregate form;
      * expects pos at the function-name identifier. */
    private def parseCall(n: String): QlCall = {
      val fn = n.toLowerCase
      if (!Functions(fn)) fail(s"unknown function '$n'")
      pos += 2 // name + (
      // nested transform-of-aggregate: fn(innerFn(field)[, N])
      val inner: Option[QlCall] = peek match {
        case Tok.Ident(inFn, false)
            if toks(pos + 1) == Tok.Sym("(") =>
          val f2 = inFn.toLowerCase
          if (!Functions(f2)) fail(s"unknown function '$inFn'")
          pos += 2 // name + (
          val (inField, _) = ident()
          var inArg: Option[Double] = None
          if (peek == Tok.Sym(",")) {
            pos += 1
            next() match {
              case Tok.Num(t) => inArg = Some(t.toDouble)
              case t => fail(s"bad function argument $t")
            }
          }
          if (f2 == "percentile" && inArg.isEmpty)
            fail("percentile(field, N) needs N")
          eatSym(")")
          Some(QlCall(f2, inField, inArg))
        case _ => None
      }
      val fieldName = inner.map(_.field).getOrElse(ident()._1)
      var arg: Option[Double] = None
      var argNs: Option[Long] = None
      var arg2: Option[Double] = None
      if (peek == Tok.Sym(",")) {
        pos += 1
        next() match {
          case Tok.Num(t)  => arg = Some(t.toDouble)
          case Tok.Dur(ns) => argNs = Some(ns)
          case t => fail(s"bad function argument $t")
        }
        // HOLT_WINTERS(mean(f), N, S) carries a second numeric arg
        if (peek == Tok.Sym(",")) {
          pos += 1
          next() match {
            case Tok.Num(t) => arg2 = Some(t.toDouble)
            case t => fail(s"bad function argument $t")
          }
        }
      }
      if (fn == "percentile" && arg.isEmpty)
        fail("percentile(field, N) needs N")
      if (fn == "moving_average" && !arg.exists(a => a == a.floor))
        fail("moving_average(field, N) needs an integer N")
      if ((fn == "top" || fn == "bottom" || fn == "sample") &&
          !arg.exists(a => a == a.floor && a >= 1))
        fail(s"$fn(field, N) needs a positive integer N")
      if (fn == "holt_winters") {
        if (inner.isEmpty) fail(
          "holt_winters(<aggregate>(field), N, S) needs an inner " +
            "aggregate over GROUP BY time(...)")
        if (!arg.exists(a => a == a.floor && a >= 1)) fail(
          "holt_winters needs a positive integer N (points to predict)")
        if (!arg2.exists(a => a == a.floor && a >= 2)) fail(
          "holt_winters needs an integer seasonal pattern S >= 2")
      }
      if (arg2.isDefined && fn != "holt_winters")
        fail(s"$fn() takes at most one argument")
      eatSym(")")
      QlCall(fn, fieldName, arg, argNs, inner, arg2)
    }

    private def fromSource(): QlSource = peek match {
      case Tok.Sym("(") =>
        pos += 1
        val inner = selectBody()
        eatSym(")")
        QlSubquery(inner)
      case Tok.Re(p) => pos += 1; QlSourceRegex(p)
      case Tok.Ident(_, _) =>
        def one(): Seq[String] = {
          var path = Vector(ident()._1)
          while (peek == Tok.Sym(".")) { pos += 1; path :+= ident()._1 }
          path
        }
        val first = one()
        if (peek != Tok.Sym(",")) QlMeasurement(first)
        else {
          var names = Vector(first.last)
          while (peek == Tok.Sym(",")) { pos += 1; names :+= one().last }
          QlSourceList(names)
        }
      case t => fail(s"bad FROM source $t")
    }

    /** WHERE in DISJUNCTIVE NORMAL FORM: a Seq of OR-alternatives,
      * each an AND-conjunct list (one alternative = the plain AND
      * chain every prior round supported). AND binds tighter than OR;
      * parentheses group; nesting distributes into DNF (alternative
      * counts stay tiny for human-written predicates). */
    private def condList(): Seq[Seq[QlCond]] = orExpr()

    private def orExpr(): Seq[Seq[QlCond]] = {
      var alts = andExpr()
      while (atKw("or")) { pos += 1; alts = alts ++ andExpr() }
      alts
    }

    private def andExpr(): Seq[Seq[QlCond]] = {
      var alts = primaryConds()
      var more = true
      while (more) {
        if (atKw("and")) {
          pos += 1
          val rhs = primaryConds()
          // DNF conjunction distributes: (A1|A2) AND (B1|B2) →
          // A1B1 | A1B2 | A2B1 | A2B2
          alts = for (l <- alts; r <- rhs) yield l ++ r
        } else more = false
      }
      alts
    }

    private def primaryConds(): Seq[Seq[QlCond]] = peek match {
      case Tok.Sym("(") =>
        pos += 1
        val inner = orExpr()
        eatSym(")")
        inner
      case _ => Seq(Seq(cond()))
    }

    private def cond(): QlCond = {
        val (operand, _) = ident()
        val op = next() match {
          case Tok.Sym(s)
            if Set("=", "!=", "<>", "<", "<=", ">", ">=", "=~", "!~")(s) =>
            if (s == "<>") "!=" else s
          case t => fail(s"bad comparison operator $t")
        }
        // negative literals: the lexer emits '-' as a standalone
        // symbol, so a signed number/duration arrives as two tokens
        val neg = peek == Tok.Sym("-")
        if (neg) pos += 1
        val lit: QlLit = next() match {
          case Tok.Num(t) if neg =>
            QlNum(-t.toDouble, s"-$t")
          case Tok.Dur(ns) if neg => QlDur(-ns)
          case t if neg => fail(s"'-' needs a number/duration, got $t")
          case Tok.Num(t)  => QlNum(t.toDouble, t)
          case Tok.Dur(ns) => QlDur(ns)
          case Tok.Str(v)  => QlStr(v)
          case Tok.Re(p)   => QlRe(p)
          case Tok.Ident(n, false) if n.equalsIgnoreCase("now") =>
            eatSym("("); eatSym(")")
            val delta = peek match {
              case Tok.Sym("-") | Tok.Sym("+") =>
                val neg = peek == Tok.Sym("-")
                pos += 1
                next() match {
                  case Tok.Dur(d) => if (neg) -d else d
                  case t => fail(s"now() ± needs a duration, got $t")
                }
              case _ => 0L
            }
            QlNowOffset(delta)
          case t           => fail(s"bad literal $t")
        }
        QlCond(operand, op, lit)
    }
  }
}
