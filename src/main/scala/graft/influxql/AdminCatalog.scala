package graft.influxql

import java.security.MessageDigest
import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Admin-tier statement surface: users/privileges, the running-query
  * registry (`SHOW QUERIES` / `KILL QUERY`), and the operator diagnostics
  * statements (`SHOW STATS` / `SHOW DIAGNOSTICS`).
  *
  * The reference secures its HTTP edge with sha256-token auth
  * (reference src/ciws_ci/data_posting_service/auth.py:16-47) and leans on
  * its InfluxDB 1.x instance for everything behind it; a user switching to
  * this library keeps sending the same InfluxDB admin statements through
  * [[MeasurementCatalog.statement]], which routes them here. Passwords are
  * stored as sha256 hex — the same digest the reference's edge uses — so
  * the differential gate can prove hash parity against DuckDB's sha256().
  *
  * Everything in this class is bounded driver-side metadata (users, grants,
  * the query registry); the only Spark jobs are the per-measurement
  * count/cardinality aggregates behind `SHOW STATS`, which stay fully
  * distributed (one partial+final agg per measurement, no collect).
  *
  * Two execution tiers, matching the library design:
  *  - [[statement]] answers pure-metadata admin statements lazily.
  *  - [[run]] is the synchronous request tier (the shape of the reference's
  *    per-HTTP-request execution, web_service.py): it registers the
  *    statement in the query registry, tags the Spark job group
  *    `graft-q<qid>` with interruptOnCancel, executes EAGERLY, and
  *    unregisters — which is what makes `KILL QUERY <qid>` a REAL
  *    cancellation (cancelJobGroup interrupts the running tasks), not a
  *    bookkeeping update.
  */
class AdminCatalog(spark: SparkSession) {
  import AdminCatalog._
  import spark.implicits._

  // ------------------------------------------------------------- users
  // user -> (sha256 hex of password, admin?); insertion order preserved so
  // SHOW USERS is deterministic without relying on map internals
  private val users = mutable.LinkedHashMap[String, (String, Boolean)]()
  // (user, db) -> granted privilege set (subset of {READ, WRITE})
  private val grants = mutable.LinkedHashMap[(String, String), Set[String]]()

  def createUser(name: String, password: String, admin: Boolean = false): Unit =
    synchronized {
      if (users.contains(name))
        throw new IllegalArgumentException(s"user already exists: '$name'")
      users(name) = (sha256Hex(password), admin)
    }

  def dropUser(name: String): Unit = synchronized {
    if (users.remove(name).isEmpty)
      throw new IllegalArgumentException(s"user not found: '$name'")
    grants.filterInPlace { case ((u, _), _) => u != name }
  }

  def setPassword(name: String, password: String): Unit = synchronized {
    val (_, admin) = users.getOrElse(name,
      throw new IllegalArgumentException(s"user not found: '$name'"))
    users(name) = (sha256Hex(password), admin)
  }

  /** Constant-shape digest compare (the lookup itself is driver-side
    * metadata; a web front end would add the reference's
    * secrets.compare_digest timing discipline at its edge). */
  def authenticate(name: String, password: String): Boolean = synchronized {
    users.get(name).exists(_._1 == sha256Hex(password))
  }

  /** Stored digest for the differential gate's hash-parity check. */
  def passwordHash(name: String): Option[String] =
    synchronized(users.get(name).map(_._1))

  /** GRANT with InfluxDB 1.x's privilege lattice: ALL = {READ, WRITE};
    * granting adds to the user's per-database set. */
  def grant(priv: String, db: String, user: String): Unit = synchronized {
    requireUser(user)
    grants((user, db)) = grants.getOrElse((user, db), Set.empty) ++ privSet(priv)
  }

  /** REVOKE removes from the set — InfluxDB's observable semantics: taking
    * READ from ALL leaves WRITE (and vice versa); revoking a privilege the
    * user doesn't hold is a no-op; an emptied set drops the row. */
  def revoke(priv: String, db: String, user: String): Unit = synchronized {
    requireUser(user)
    val left = grants.getOrElse((user, db), Set.empty) -- privSet(priv)
    if (left.isEmpty) grants.remove((user, db)) else grants((user, db)) = left
  }

  /** Admin bit flip for the ON-less GRANT/REVOKE ALL PRIVILEGES forms. */
  def setAdmin(user: String, admin: Boolean): Unit = synchronized {
    val (hash, _) = users.getOrElse(user,
      throw new IllegalArgumentException(s"user not found: '$user'"))
    users(user) = (hash, admin)
  }

  private def requireUser(user: String): Unit =
    if (!users.contains(user))
      throw new IllegalArgumentException(s"user not found: '$user'")

  // ---------------------------------------------------- query registry
  private case class Entry(qid: Long, query: String, db: String,
    startNs: Long, var status: String)
  private val registry = mutable.LinkedHashMap[Long, Entry]()
  private var nextQid = 0L

  /** Register an in-flight statement; returns its qid. The paired Spark
    * job group name is [[jobGroup]](qid). */
  def register(query: String, db: String): Long = synchronized {
    nextQid += 1
    registry(nextQid) = Entry(nextQid, query, db, System.nanoTime(), "running")
    nextQid
  }

  /** running → finished; a kill that already landed wins. */
  def finish(qid: Long): Unit = synchronized {
    registry.get(qid).filter(_.status == "running").foreach(_.status = "finished")
  }

  /** KILL QUERY: mark killed and cancel the query's job group — with
    * interruptOnCancel set at [[run]] time this interrupts the running
    * tasks, so a query blocked inside a stage actually stops. */
  def kill(qid: Long): Unit = {
    synchronized {
      registry.get(qid).filter(_.status == "running").foreach(_.status = "killed")
    }
    spark.sparkContext.cancelJobGroup(jobGroup(qid))
  }

  /** Post-hoc audit of every statement this catalog has executed:
    * (qid, query, database, status). Driver-side bounded. */
  def auditLog: DataFrame = {
    val rows = synchronized(registry.values.toSeq)
      .map(e => (e.qid, e.query, e.db, e.status))
    rows.toDF("qid", "query", "database", "status")
  }

  def queryStatus(qid: Long): Option[String] =
    synchronized(registry.get(qid).map(_.status))

  /** `SHOW QUERIES`: the in-flight statements, InfluxDB's columns. The
    * duration renders floored to whole seconds — sub-second in-flight
    * queries print "0s" — so the output stays deterministic under a
    * differential gate while still being the operator's signal for the
    * stuck multi-minute query. */
  private def showQueries: DataFrame = {
    val now = System.nanoTime()
    val rows = synchronized(registry.values.filter(_.status == "running").toSeq)
      .map(e => (e.qid, e.query, e.db, s"${(now - e.startNs) / 1000000000L}s"))
    rows.toDF("qid", "query", "database", "duration")
  }

  // ------------------------------------------------------- statements

  /** Lazy metadata tier: answer one admin statement. Statements that need
    * the measurement catalog (SHOW STATS) read it through `cat`. */
  def statement(q: String, cat: MeasurementCatalog): DataFrame = q match {
    case CreateUserRe(name, pw, allPriv) =>
      createUser(name, pw, admin = allPriv != null); empty
    case DropUserRe(name) => dropUser(name); empty
    case SetPasswordRe(name, pw) => setPassword(name, pw); empty
    case GrantAdminRe(user) => setAdmin(user, admin = true); empty
    case RevokeAdminRe(user) => setAdmin(user, admin = false); empty
    case GrantRe(priv, db, user) => grant(priv, db, user); empty
    case RevokeRe(priv, db, user) => revoke(priv, db, user); empty
    case ShowUsersRe() =>
      synchronized(users.toSeq).map { case (u, (_, a)) => (u, a) }
        .toDF("user", "admin")
    case ShowGrantsRe(user) =>
      requireUser(user)
      synchronized(grants.toSeq).collect {
        case ((u, db), privs) if u == user => (db, renderPrivs(privs))
      }.toDF("database", "privilege")
    case ShowQueriesRe() => showQueries
    case KillQueryRe(qid) => kill(qid.toLong); empty
    case ShowStatsRe() => showStats(cat)
    case ShowDiagnosticsRe() => showDiagnostics
    case other => throw new IllegalArgumentException(
      s"not an admin statement: '$other'")
  }

  /** Synchronous request tier: registry-tracked, job-group-tagged, EAGER
    * execution of any statement through the full catalog front door. The
    * one non-lazy entry point in the library, because that is what the
    * statements it exists for (SHOW QUERIES / KILL QUERY) are about:
    * observing and interrupting executions in progress. */
  def run(cat: MeasurementCatalog, q: String, now: Option[String] = None): DataFrame =
    q match {
      // pure registry statements answer inline — KILL must not deadlock on
      // tracking itself, and SHOW QUERIES lists ITSELF as InfluxDB's does
      case KillQueryRe(qid) => kill(qid.toLong); empty
      case ShowQueriesRe() =>
        val qid = register(q.trim, dbLabel(cat))
        try {
          val snapshot = showQueries
          // materialize before finish() so the self-row survives
          val rows = snapshot.collect().toSeq
          spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), snapshot.schema)
        } finally finish(qid)
      case _ =>
        val qid = register(q.trim, dbLabel(cat))
        val sc = spark.sparkContext
        sc.setJobGroup(jobGroup(qid), q.trim, interruptOnCancel = true)
        try runFrameTracked(qid, cat.statement(q, now))
        finally { sc.clearJobGroup(); finish(qid) }
    }

  /** Tracked eager execution of a pre-built frame — the hook a serving
    * layer uses for plans it assembled itself. Returns the materialized
    * frame; a kill surfaces as the underlying SparkException. */
  def runFrame(label: String, db: String, df: DataFrame): DataFrame = {
    val qid = register(label, db)
    val sc = spark.sparkContext
    sc.setJobGroup(jobGroup(qid), label, interruptOnCancel = true)
    try runFrameTracked(qid, df)
    finally { sc.clearJobGroup(); finish(qid) }
  }

  /** Eager materialization: localCheckpoint runs the plan NOW under the
    * current job group and hands back a short-lineage frame. */
  private def runFrameTracked(qid: Long, df: DataFrame): DataFrame =
    df.localCheckpoint()

  private def dbLabel(cat: MeasurementCatalog): String =
    cat.currentDbOption.getOrElse("")

  /** `SHOW STATS`: per-measurement storage statistics of the current
    * database — the operator's cardinality/volume dashboard in one
    * statement. points = row count; series = exact distinct tag-set count
    * (tags are the string columns, the convention [[InfluxQL.runMeta]]
    * uses throughout). One distributed agg per measurement, unioned. */
  private def showStats(cat: MeasurementCatalog): DataFrame = {
    val db = cat.currentDbOption.getOrElse(
      throw new IllegalStateException("no database selected — CREATE/USE first"))
    val ms = cat.measurements(db)
    if (ms.isEmpty)
      return Seq.empty[(String, String, String, Long, Long)]
        .toDF("module", "database", "measurement", "points", "series")
    ms.map { case (m, df0) =>
      val df = graft.Tables.normalizeTs(df0, "time")
      val tags = df.schema.fields
        .filter(f => f.name != "time" && f.dataType == StringType)
        .map(_.name).toSeq.sorted
      val series: Column =
        if (tags.isEmpty) lit(1L)
        else count_distinct(struct(tags.map(col): _*))
      df.agg(count(lit(1)).cast("long").as("points"),
          series.cast("long").as("series"))
        .select(lit("database").as("module"), lit(db).as("database"),
          lit(m).as("measurement"), col("points"), col("series"))
    }.reduce(_ unionByName _).orderBy(col("measurement"))
  }

  /** `SHOW DIAGNOSTICS`: build + session configuration as (module, name,
    * value) rows — the flattened form of InfluxDB's per-module sections.
    * Values echo the LIVE session so the statement is truthful wherever it
    * runs. */
  private def showDiagnostics: DataFrame = Seq(
    ("build", "engine", "graft"),
    ("build", "spark_version", spark.version),
    ("config", "session_timezone",
      spark.conf.get("spark.sql.session.timeZone")),
    ("config", "shuffle_partitions",
      spark.conf.get("spark.sql.shuffle.partitions")),
    ("config", "adaptive_execution",
      spark.conf.get("spark.sql.adaptive.enabled"))
  ).toDF("module", "name", "value")

  private def empty: DataFrame = Seq.empty[String].toDF("name")
}

object AdminCatalog {
  def jobGroup(qid: Long): String = s"graft-q$qid"

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def privSet(priv: String): Set[String] =
    priv.trim.toUpperCase.split("\\s+").head match {
      case "ALL" => Set("READ", "WRITE")
      case p @ ("READ" | "WRITE") => Set(p)
      case other => throw new IllegalArgumentException(
        s"unknown privilege '$other'")
    }

  private def renderPrivs(privs: Set[String]): String =
    if (privs == Set("READ", "WRITE")) "ALL PRIVILEGES"
    else privs.headOption.getOrElse("NO PRIVILEGES")

  private val CreateUserRe =
    ("""(?i)^\s*CREATE\s+USER\s+"?(\w+)"?\s+WITH\s+PASSWORD\s+'([^']*)'""" +
      """(\s+WITH\s+ALL\s+PRIVILEGES)?\s*;?\s*$""").r
  private val DropUserRe = """(?i)^\s*DROP\s+USER\s+"?(\w+)"?\s*;?\s*$""".r
  private val SetPasswordRe =
    """(?i)^\s*SET\s+PASSWORD\s+FOR\s+"?(\w+)"?\s*=\s*'([^']*)'\s*;?\s*$""".r
  private val GrantAdminRe =
    """(?i)^\s*GRANT\s+ALL\s+PRIVILEGES\s+TO\s+"?(\w+)"?\s*;?\s*$""".r
  private val RevokeAdminRe =
    """(?i)^\s*REVOKE\s+ALL\s+PRIVILEGES\s+FROM\s+"?(\w+)"?\s*;?\s*$""".r
  private val GrantRe =
    ("""(?i)^\s*GRANT\s+(READ|WRITE|ALL(?:\s+PRIVILEGES)?)\s+ON\s+"?([\w.]+)"?""" +
      """\s+TO\s+"?(\w+)"?\s*;?\s*$""").r
  private val RevokeRe =
    ("""(?i)^\s*REVOKE\s+(READ|WRITE|ALL(?:\s+PRIVILEGES)?)\s+ON\s+"?([\w.]+)"?""" +
      """\s+FROM\s+"?(\w+)"?\s*;?\s*$""").r
  private val ShowUsersRe = """(?i)^\s*SHOW\s+USERS\s*;?\s*$""".r
  private val ShowGrantsRe =
    """(?i)^\s*SHOW\s+GRANTS\s+FOR\s+"?(\w+)"?\s*;?\s*$""".r
  private val ShowQueriesRe = """(?i)^\s*SHOW\s+QUERIES\s*;?\s*$""".r
  private val KillQueryRe = """(?i)^\s*KILL\s+QUERY\s+(\d+)\s*;?\s*$""".r
  private val ShowStatsRe = """(?i)^\s*SHOW\s+STATS\s*;?\s*$""".r
  private val ShowDiagnosticsRe = """(?i)^\s*SHOW\s+DIAGNOSTICS\s*;?\s*$""".r

  /** Statement-router predicate for [[MeasurementCatalog.statement]]. */
  private[influxql] val AdminStmtRe =
    ("""(?i)^\s*(CREATE\s+USER|DROP\s+USER|SET\s+PASSWORD|GRANT\s|REVOKE\s|""" +
      """SHOW\s+USERS|SHOW\s+GRANTS|SHOW\s+QUERIES|KILL\s+QUERY|""" +
      """SHOW\s+STATS|SHOW\s+DIAGNOSTICS).*""").r
  def handles(q: String): Boolean = AdminStmtRe.matches(q)
}
