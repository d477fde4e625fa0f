package graft.influxql

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Database-level catalog over measurement frames — the management surface a
  * deployment touches before any data query (the reference's setup issues
  * `CREATE DATABASE` first, reference doc/deployment_guide.md:16-33, and
  * `SHOW DATABASES` is the first discovery call a Grafana datasource makes).
  *
  * Purely driver-side metadata: a database is a name → measurement-frame
  * map, and the frames stay lazy Spark plans — registering a measurement
  * launches no job; only running a statement against it does. One catalog
  * serves the whole [[InfluxQL]] surface through [[statement]]: database
  * DDL is answered here, SELECT / SHOW delegate to
  * [[InfluxQL.runCatalog]] / [[InfluxQL.runMeta]] over the current
  * database's measurements.
  */
class MeasurementCatalog(spark: SparkSession) {
  import MeasurementCatalog._
  import spark.implicits._

  private val dbs =
    mutable.LinkedHashMap[String, mutable.LinkedHashMap[String, DataFrame]]()
  private var current: Option[String] = None

  /** Idempotent, as InfluxDB's CREATE DATABASE — re-creating an existing
    * database never drops its measurements. The first database created
    * becomes current until USE says otherwise. */
  def createDatabase(name: String): Unit = synchronized {
    dbs.getOrElseUpdate(name, mutable.LinkedHashMap())
    if (current.isEmpty) current = Some(name)
  }

  def dropDatabase(name: String): Unit = synchronized {
    dbs.remove(name)
    if (current.contains(name)) current = dbs.keys.headOption
  }

  def use(name: String): Unit = synchronized {
    if (!dbs.contains(name))
      throw new IllegalArgumentException(s"unknown database '$name'")
    current = Some(name)
  }

  def databases: Seq[String] = synchronized(dbs.keys.toSeq)

  /** Register (or replace) a measurement frame; creates the database if
    * needed, so loader code needs no separate DDL step. */
  def register(db: String, measurement: String, df: DataFrame): Unit =
    synchronized {
      createDatabase(db)
      dbs(db)(measurement) = df
    }

  def measurements(db: String): Seq[(String, DataFrame)] = synchronized {
    dbs.getOrElse(db,
      throw new IllegalArgumentException(s"unknown database '$db'")).toSeq
  }

  private def currentDb: String = synchronized {
    current.getOrElse(
      throw new IllegalStateException("no database selected — CREATE/USE first"))
  }

  /** Continuous-query registry behind this catalog's front door (lazy: a
    * catalog used only for data queries never touches the CQ machinery).
    * Checkpoints/outputs live under the JVM temp dir unless
    * [[attachCqRegistry]] points somewhere durable. */
  private var cqRegistry: Option[graft.streaming.CqRegistry] = None

  def attachCqRegistry(reg: graft.streaming.CqRegistry): Unit =
    synchronized { cqRegistry = Some(reg) }

  private def cqs: graft.streaming.CqRegistry = synchronized {
    cqRegistry.getOrElse {
      val reg = new graft.streaming.CqRegistry(spark,
        java.nio.file.Files.createTempDirectory("graft_cq").toString)
      cqRegistry = Some(reg)
      reg
    }
  }

  private val CqStmtRe =
    """(?i)^\s*(?:CREATE\s+CONTINUOUS\s+QUERY|SHOW\s+CONTINUOUS\s+QUERIES|DROP\s+CONTINUOUS\s+QUERY).*""".r

  /** One front door for every statement the CLI or a datasource sends.
    * Database DDL mutates the catalog and returns the empty result InfluxDB
    * returns; `SHOW DATABASES` lists names; CONTINUOUS QUERY management
    * routes to the [[graft.streaming.CqRegistry]]; everything else resolves
    * against the current database — SELECT through the full query
    * translation, SHOW through the metadata path. */
  def statement(q: String, now: Option[String] = None): DataFrame = q match {
    case ShowDbRe() =>
      synchronized(dbs.keys.toSeq.sorted).toDF("name")
    case CreateDbRe(name) =>
      createDatabase(name); emptyNames
    case DropDbRe(name) =>
      dropDatabase(name); emptyNames
    case UseRe(name) =>
      use(name); emptyNames
    case CqStmtRe() =>
      cqs.statement(q)
    case _ if q.trim.toUpperCase.startsWith("SELECT") =>
      InfluxQL.runCatalog(spark, measurements(currentDb), q, now)
    case _ =>
      InfluxQL.runMeta(spark, measurements(currentDb), q)
  }

  private def emptyNames: DataFrame = Seq.empty[String].toDF("name")
}

object MeasurementCatalog {
  private val ShowDbRe = """(?i)^\s*SHOW\s+DATABASES\s*;?\s*$""".r
  private val CreateDbRe = """(?i)^\s*CREATE\s+DATABASE\s+"?([\w.]+)"?\s*;?\s*$""".r
  private val DropDbRe = """(?i)^\s*DROP\s+DATABASE\s+"?([\w.]+)"?\s*;?\s*$""".r
  private val UseRe = """(?i)^\s*USE\s+"?([\w.]+)"?\s*;?\s*$""".r
}
