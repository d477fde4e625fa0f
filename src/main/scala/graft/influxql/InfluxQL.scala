package graft.influxql

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A front end for the practical subset of InfluxQL the reference's users
  * actually write (get_hot_intake_interval.py:117, the Grafana dashboards
  * of doc/configuration.rst, and InfluxDB's query_language spec):
  *
  * {{{
  * SELECT <field | agg(field)> [AS alias] [, ...]
  * FROM <measurement>
  * [WHERE time >= '...' [AND time < '...'] [AND tag = 'v' | field op n]...]
  * [GROUP BY time(<Nu>)[, <tag>...]] [fill(previous|0|none)]
  * [ORDER BY time [DESC]]
  * [LIMIT n]
  * }}}
  *
  * aggs: mean, sum, count, min, max. Conditions are AND-combined (the only
  * combinator the reference uses). The translator emits a declarative
  * DataFrame plan — time/tag predicates land in the scan (partition
  * pruning at scale), GROUP BY time() becomes the tumbling `window()`
  * expression (shared with the streaming ops), fill(previous) becomes a
  * bucket-spine join + LOCF window. Mirrors InfluxDB fill(none) bucket
  * semantics for plain GROUP BY time (only non-empty buckets emit).
  *
  * `mean`/`sum` accumulate in decimal ([[Tables.davg]]/[[Tables.dsum]])
  * so results are engine-stable for the differential oracle.
  */
object InfluxQL {

  sealed trait Field { def alias: Option[String] }
  final case class Raw(name: String, alias: Option[String]) extends Field
  final case class Agg(fn: String, field: String, alias: Option[String]) extends Field

  /** One `col op literal` conjunct; value is a quoted string or a number. */
  final case class Cond(col: String, op: String, value: Either[String, Double])

  final case class Query(
    fields: Seq[Field],
    measurement: String,
    conds: Seq[Cond],
    timeBucket: Option[(Int, String)], // (n, unit s|m|h|d)
    groupTags: Seq[String],
    fill: Option[String],
    orderDesc: Boolean,
    limit: Option[Int],
    into: Option[String] = None)

  private val SelectRe =
    ("""(?is)^\s*SELECT\s+(.+?)""" +
      """(?:\s+INTO\s+"?([\w.]+)"?)?\s+FROM\s+"?([\w.]+)"?""" +
      """(?:\s+WHERE\s+(.+?))?""" +
      """(?:\s+GROUP\s+BY\s+(.+?))?""" +
      """(?:\s+fill\((\w+)\))?""" +
      """(?:\s+ORDER\s+BY\s+time(\s+DESC)?)?""" +
      """(?:\s+LIMIT\s+(\d+))?\s*;?\s*$""").r

  private val AggRe = """(?i)^(mean|sum|count|min|max)\(\s*"?(\w+)"?\s*\)(?:\s+AS\s+(\w+))?$""".r
  private val RawRe = """(?i)^"?(\w+)"?(?:\s+AS\s+(\w+))?$""".r
  private val CondRe = """(?i)^\s*"?(\w+)"?\s*(<=|>=|!=|=|<|>)\s*(?:'([^']*)'|(-?[0-9.]+))\s*$""".r
  private val TimeRe = """(?i)^time\((\d+)([smhd])\)$""".r

  def parse(q: String): Query = q match {
    case SelectRe(fieldsS, intoS, meas, whereS, groupS, fillS, descS, limitS) =>
      val fields = fieldsS.split(",").map(_.trim).toSeq.map {
        case AggRe(fn, f, al) => Agg(fn.toLowerCase, f, Option(al))
        case RawRe(f, al) => Raw(f, Option(al))
        case other => fail(q, s"unsupported select item '$other'")
      }
      val conds = Option(whereS).toSeq.flatMap(_.split("(?i)\\s+AND\\s+").toSeq).map {
        case CondRe(c, op, s, n) =>
          Cond(c, op, if (s != null) Left(s) else Right(n.toDouble))
        case other => fail(q, s"unsupported condition '$other'")
      }
      var bucket: Option[(Int, String)] = None
      val tags = Option(groupS).toSeq.flatMap(_.split(",").map(_.trim).toSeq).flatMap {
        case TimeRe(n, u) => bucket = Some((n.toInt, u)); None
        case t => Some(t.stripPrefix("\"").stripSuffix("\""))
      }
      Query(fields, meas, conds, bucket, tags, Option(fillS).map(_.toLowerCase),
        descS != null, Option(limitS).map(_.toInt), Option(intoS))
    case _ => fail(q, "not a supported InfluxQL SELECT")
  }

  private def fail(q: String, why: String): Nothing =
    throw new IllegalArgumentException(s"InfluxQL: $why in: $q")

  /** Canonical rendering of a parsed query — `parse(print(q)) == q` is the
    * parser's round-trip law (property-checked in the spec). */
  def print(q: Query): String = {
    def f(fl: Field): String = (fl match {
      case Raw(n, _) => n
      case Agg(fn, n, _) => s"$fn($n)"
    }) + fl.alias.map(" AS " + _).getOrElse("")
    val where =
      if (q.conds.isEmpty) ""
      else " WHERE " + q.conds.map(c =>
        s"${c.col} ${c.op} " + c.value.fold(s => s"'$s'", _.toString))
        .mkString(" AND ")
    val grpItems = q.timeBucket.map { case (n, u) => s"time($n$u)" }.toSeq ++
      q.groupTags
    val grp = if (grpItems.isEmpty) "" else " GROUP BY " + grpItems.mkString(", ")
    s"SELECT ${q.fields.map(f).mkString(", ")}" +
      q.into.map(t => s" INTO $t").getOrElse("") +
      s" FROM ${q.measurement}$where$grp" +
      q.fill.map(x => s" fill($x)").getOrElse("") +
      (if (q.orderDesc) " ORDER BY time DESC" else "") +
      q.limit.map(n => s" LIMIT $n").getOrElse("")
  }

  private val Units = Map("s" -> "seconds", "m" -> "minutes",
    "h" -> "hours", "d" -> "days")

  private def condCol(c: Cond): Column = {
    val l = col(c.col)
    val r: Column = c.value match {
      case Left(s) if c.col == "time" => to_timestamp(lit(s))
      case Left(s) => lit(s)
      case Right(n) => lit(n)
    }
    c.op match {
      case "=" => l === r
      case "!=" => l =!= r
      case "<" => l < r
      case "<=" => l <= r
      case ">" => l > r
      case ">=" => l >= r
    }
  }

  private def aggCol(a: Agg): Column = {
    val c = col(a.field)
    val out = a.fn match {
      case "mean" => Tables.davg(c)
      case "sum" => Tables.dsum(c)
      case "count" => count(c)
      case "min" => min(c)
      case "max" => max(c)
    }
    out.as(a.alias.getOrElse(s"${a.fn}_${a.field}"))
  }

  /** Translate and run `q` against `source` — a measurement frame whose
    * event-time column is named `time` (the [[graft.store.MeasurementStore]]
    * read shape). */
  def run(spark: SparkSession, source: DataFrame, q: String): DataFrame = {
    val p = parse(q)
    val base = p.conds.foldLeft(source)((df, c) => df.filter(condCol(c)))
    val aggs = p.fields.collect { case a: Agg => a }
    // InfluxDB rejects mixing bare fields with aggregates; failing loudly
    // beats silently dropping the raw fields
    if (aggs.nonEmpty && aggs.size != p.fields.size)
      fail(q, "cannot mix raw fields with aggregate functions")
    val projected = p.timeBucket match {
      case None if aggs.isEmpty =>
        val cols = col("time") +: p.fields.map { f =>
          col(f.asInstanceOf[Raw].name)
            .as(f.alias.getOrElse(f.asInstanceOf[Raw].name))
        }
        base.select(cols: _*)
      case None =>
        // global aggregation (no bucket): one row
        base.agg(aggs.head |> aggCol, aggs.tail.map(aggCol): _*)
      case Some((n, u)) =>
        val win = window(col("time"), s"$n ${Units(u)}")
        val keys = win.as("w") +: p.groupTags.map(col)
        val agged = base.groupBy(keys: _*)
          .agg(aggs.head |> aggCol, aggs.tail.map(aggCol): _*)
          .withColumn("time", col("w.start")).drop("w")
        p.fill match {
          case Some("previous") | Some("0") =>
            fillBuckets(spark, base, agged, p, n, u)
          case _ => agged
        }
    }
    val limited = p.limit match {
      case Some(n) =>
        val key = if (p.orderDesc) col("time").desc else col("time").asc
        val rest = projected.columns.filter(_ != "time").map(col).toSeq
        projected.orderBy(key +: rest: _*).limit(n)
      case None => projected
    }
    limited
  }

  /** InfluxDB fill(): densify the bucket spine over the queried time range
    * (WHERE bounds required, as in InfluxDB) per tag combination, then
    * fill(previous) = LOCF window per tag, fill(0) = coalesce. */
  private def fillBuckets(spark: SparkSession, base: DataFrame,
    agged: DataFrame, p: Query, n: Int, u: String): DataFrame = {
    val lo = p.conds.find(c => c.col == "time" && c.op.startsWith(">"))
      .map(_.value.left.getOrElse(fail("", "time bound must be a literal")))
      .getOrElse(fail("", "fill() requires a lower time bound"))
    val hi = p.conds.find(c => c.col == "time" && c.op.startsWith("<"))
      .map(_.value.left.getOrElse(fail("", "time bound must be a literal")))
      .getOrElse(fail("", "fill() requires an upper time bound"))
    val step = expr(s"INTERVAL $n ${Units(u)}")
    // bucket starts: window-aligned sequence over [lo, hi)
    val spine = spark.range(1).select(explode(sequence(
      window(to_timestamp(lit(lo)), s"$n ${Units(u)}").getField("start"),
      to_timestamp(lit(hi)) - expr("INTERVAL 1 MICROSECOND"),
      step)).as("time"))
    val keyed =
      if (p.groupTags.isEmpty) spine
      else spine.crossJoin(base.select(p.groupTags.map(col): _*).distinct())
    val joined = keyed.join(agged, "time" +: p.groupTags, "left_outer")
    val valueCols = agged.columns.filterNot(c =>
      c == "time" || p.groupTags.contains(c))
    p.fill match {
      case Some("0") =>
        valueCols.foldLeft(joined)((df, c) =>
          df.withColumn(c, coalesce(col(c), lit(0))))
      case _ => // previous
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(p.groupTags.map(col): _*)
          .orderBy(col("time"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        valueCols.foldLeft(joined)((df, c) =>
          df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    }
  }

  private val ShowMeasRe = """(?i)^\s*SHOW\s+MEASUREMENTS\s*;?\s*$""".r
  private val ShowTagRe = """(?i)^\s*SHOW\s+TAG\s+KEYS\s+FROM\s+"?(\w+)"?\s*;?\s*$""".r
  private val ShowFieldRe = """(?i)^\s*SHOW\s+FIELD\s+KEYS\s+FROM\s+"?(\w+)"?\s*;?\s*$""".r

  /** InfluxQL metadata queries (the discovery surface the CLI and Grafana
    * issue before any SELECT): SHOW MEASUREMENTS / TAG KEYS / FIELD KEYS,
    * answered from the catalog of measurement frames. Influx convention:
    * tags are the string-typed columns, fields the numeric/boolean ones,
    * `time` is neither. */
  def runMeta(spark: SparkSession,
    catalog: Seq[(String, DataFrame)], q: String): DataFrame = {
    import spark.implicits._
    def frame(m: String): DataFrame = catalog.collectFirst {
      case (n, df) if n == m => df
    }.getOrElse(fail(q, s"unknown measurement '$m'"))
    q match {
      case ShowMeasRe() =>
        catalog.map(_._1).sorted.toDF("name")
      case ShowTagRe(m) =>
        frame(m).schema.fields
          .filter(f => f.name != "time" &&
            f.dataType == org.apache.spark.sql.types.StringType)
          .map(_.name).toSeq.sorted.toDF("tagKey")
      case ShowFieldRe(m) =>
        import org.apache.spark.sql.types._
        frame(m).schema.fields.toSeq
          .collect {
            case f if f.name != "time" && (f.dataType == FloatType
              || f.dataType == DoubleType) => (f.name, "float")
            case f if f.name != "time" && (f.dataType == IntegerType
              || f.dataType == LongType) => (f.name, "integer")
            case f if f.name != "time" && f.dataType == BooleanType =>
              (f.name, "boolean")
          }
          .sorted.toDF("fieldKey", "fieldType")
      case _ => fail(q, "not a supported metadata query")
    }
  }

  /** Tiny pipe helper so agg lists read naturally above. */
  private implicit class Pipe[A](private val a: A) extends AnyVal {
    def |>[B](f: A => B): B = f(a)
  }
}
