package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Vector similarity operators (SURVEY.md §2.10): brute-force cosine top-k
  * as the exactness baseline, sign-bit LSH bucketing as the scale path, and
  * per-label centroids (the IVF coarse quantizer). Dot products are
  * sequential double folds over `zip_with` — codegen'd, bit-stable across
  * engines, no UDFs.
  *
  * 100 TB shape: queries broadcast (never the corpus); bucketed variants
  * shuffle each vector once by bucket key; the only all-pairs work happens
  * inside a bucket. Nothing here materializes an unbucketed cross join
  * against the full table — except the small fixed query set of the
  * brute-force baseline, whose cost is |Q|·n with |Q| broadcast.
  */
object Vectors {
  import Relational.{totalOrder, orderAll}

  /** Exact sequential-fold dot product (bit-stable across engines). */
  private[ops] def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  private[ops] def norm(a: Column): Column = sqrt(dot(a, a))

  private def withNorm(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "embeddings")
      .withColumn("nrm", norm(col("embedding")))

  /** Brute-force cosine top-k (SURVEY §2.10 sim_knn_bruteforce): a small
    * fixed query set (vec_id % 100 = 0) broadcast against the corpus;
    * exact top-5 neighbors per query via TakeOrdered-style window. */
  def simKnnBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val base = withNorm(spark, dir)
    val queries = base.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    totalOrder(base.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine",
        dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        col("rk"), col("cosine")))
  }

  /** Sign-bit LSH near-neighbor pairs (SURVEY §2.10 scale path): bucket by
    * the sign pattern of the first 3 dimensions (axis-aligned random
    * hyperplanes); all-pairs cosine only within a bucket; threshold keeps
    * true near-neighbors. Deterministic, so it carries a full DuckDB
    * oracle — the recall/precision tradeoff vs brute force is measured in
    * the spec instead. */
  def simCosineLsh(spark: SparkSession, dir: String): DataFrame = {
    // the in-bucket all-pairs loop is the hot path: use the fused VecDot
    // expression (bit-identical sequential fold, ~6x the lambda's speed)
    import graft.functions.GraftFunctions.vecDot
    val b = load(spark, dir, "embeddings")
      .withColumn("nrm", sqrt(vecDot(spark, col("embedding"), col("embedding"))))
      .withColumn("bucket",
        (when(element_at(col("embedding"), 1) >= 0, 4).otherwise(0)
          + when(element_at(col("embedding"), 2) >= 0, 2).otherwise(0)
          + when(element_at(col("embedding"), 3) >= 0, 1).otherwise(0)))
    totalOrder(b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket")
          && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine", vecDot(spark, col("a.embedding"), col("b.embedding"))
        / (col("a.nrm") * col("b.nrm")))
      .filter(col("cosine") >= 0.4)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        col("a.bucket").as("lsh_bucket"), col("cosine")))
  }

  /** Per-label centroid, one row per (label, dimension) — the IVF coarse
    * quantizer / cluster summary (SURVEY §2.9 vector-centroid Aggregator
    * scope, expressed as posexplode + decimal-exact mean so it carries an
    * oracle; the Aggregator variant lives in the ANN library path). */
  def vecCentroid(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      // scale 6 keeps the decimal→double conversion exact (the summed
      // magnitude stays far below 2^53 µ-units); scale 18 would make that
      // final conversion itself round, and engines round it differently
      .agg(davg(col("x").cast(DoubleType)).as("centroid"),
        count(lit(1)).as("n"))
      .filter(col("dim") < 8)) // demo slice: first 8 dims keep output small

  /** Brute-force kNN on the custom codegen'd [[graft.functions.VecDot]]
    * expression (SURVEY §2.9/§4): one fused primitive loop per row instead
    * of the zip_with lambda-array; results are bit-identical to
    * sim_knn_bruteforce (same IEEE sequence), so it shares that oracle. */
  def simKnnNative(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.vecDot
    val base = load(spark, dir, "embeddings")
      .withColumn("nrm", sqrt(vecDot(spark, col("embedding"), col("embedding"))))
    val queries = base.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    totalOrder(base.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine",
        vecDot(spark, col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        col("rk"), col("cosine")))
  }

  /** Per-label centroid via the typed micro-unit Aggregator (SURVEY §2.9
    * UDAF path) — partial aggregation across partitions with an exact
    * integer buffer, so results match the posexplode formulation (and its
    * oracle) bit-for-bit under any partitioning. */
  def vecCentroidNative(spark: SparkSession, dir: String): DataFrame = {
    val agg = org.apache.spark.sql.functions.udaf(
      new graft.functions.GraftFunctions.VecCentroid(64),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    totalOrder(load(spark, dir, "embeddings")
      .groupBy(col("label"))
      .agg(agg(col("embedding")).as("c"), count(lit(1)).as("n"))
      .select(col("label"), posexplode(col("c")).as(Seq("dim", "centroid")), col("n"))
      .filter(col("dim") < 8)
      .select(col("label"), col("dim"), col("centroid"), col("n")))
  }

  /** IVF-style approximate kNN (SURVEY §2.10 scale path): the inverted-file
    * search that replaces brute force at 100 TB. Stage 1 — coarse quantizer:
    * one centroid per `label` list via the exact micro-unit mean (decimal
    * accumulation ⇒ bit-identical in Spark and DuckDB). Stage 2 — each query
    * probes its nprobe=2 nearest centroids (a |Q|×k broadcast nested loop,
    * never the corpus). Stage 3 — exact cosine only within the probed lists
    * (corpus touched ≈ nprobe/k of brute force; the scan stays pruned by the
    * `label` partition key at scale). Deterministic ⇒ full DuckDB oracle;
    * recall vs sim_knn_bruteforce is measured in the spec. */
  def simKnnIvf(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.vecDot
    val nprobe = 2
    val base = load(spark, dir, "embeddings")
      .withColumn("nrm", sqrt(vecDot(spark, col("embedding"), col("embedding"))))
    val centroidAgg = org.apache.spark.sql.functions.udaf(
      new graft.functions.GraftFunctions.VecCentroid(64),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    val centroids = base.groupBy(col("label"))
      .agg(centroidAgg(col("embedding")).as("cvec"))
      .withColumn("cnrm", sqrt(aggregate(col("cvec"), lit(0.0),
        (acc, x) => acc + x * x)))
    val queries = base.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    // stage 2: probe assignment — |Q| × k tiny nested loop, centroids broadcast
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("qc_cos").desc, col("label"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("qc_cos",
        aggregate(zip_with(col("q_emb"), col("cvec"),
          (x, y) => x.cast(DoubleType) * y), lit(0.0), (acc, x) => acc + x)
          / (col("q_nrm") * col("cnrm")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("label"))
    // stage 3: exact search within the probed lists only
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    totalOrder(probes.join(base, "label")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine",
        vecDot(spark, col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        col("rk"), col("cosine")))
  }

  // ----------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_knn_bruteforce" -> simKnnBruteforce,
    "sim_knn_native" -> simKnnNative,
    "sim_knn_ivf" -> simKnnIvf,
    "sim_cosine_lsh" -> simCosineLsh,
    "vec_centroid" -> vecCentroid,
    "vec_centroid_native" -> vecCentroidNative)

  private val sqlDot =
    "list_aggregate(list_transform(list_zip(%s, %s), " +
      "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')"

  private val sqlNorm =
    "sqrt(list_aggregate(list_transform(%s, " +
      "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"

  val oracle: Map[String, String] = oracleBase +
    ("sim_knn_native" -> oracleBase("sim_knn_bruteforce")) +
    ("vec_centroid_native" -> oracleBase("vec_centroid")) +
    ("sim_knn_ivf" ->
      s"""WITH base AS (
         |  SELECT vec_id, label, embedding, ${sqlNorm.format("embedding")} AS nrm
         |  FROM embeddings),
         |cent AS (
         |  SELECT label, i,
         |    ${graft.Tables.sqlDavg("CAST(embedding[i] AS DOUBLE)")} AS c
         |  FROM embeddings, generate_series(1, 64) AS t(i)
         |  GROUP BY label, i),
         |cn AS (
         |  SELECT label, cvec,
         |    sqrt(list_aggregate(list_transform(cvec, x -> x * x), 'sum')) AS cnrm
         |  FROM (SELECT label, list(c ORDER BY i) AS cvec FROM cent GROUP BY label)),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm
         |      FROM base WHERE vec_id % 100 = 0),
         |probes AS (
         |  SELECT q_id, q_emb, q_nrm, label FROM (
         |    SELECT q.q_id, q.q_emb, q.q_nrm, c.label,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
         |        list_aggregate(list_transform(list_zip(q.q_emb, c.cvec),
         |          x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')
         |          / (q.q_nrm * c.cnrm) DESC, c.label) AS pr
         |    FROM q CROSS JOIN cn c) WHERE pr <= 2),
         |scored AS (
         |  SELECT p.q_id, b.vec_id,
         |    ${sqlDot.format("b.embedding", "p.q_emb")} / (b.nrm * p.q_nrm) AS cosine
         |  FROM probes p JOIN base b ON b.label = p.label
         |  WHERE b.vec_id <> p.q_id),
         |ranked AS (
         |  SELECT q_id, vec_id AS neighbor_id, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cosine DESC, vec_id) AS rk
         |  FROM scored)
         |SELECT q_id, neighbor_id, rk, cosine FROM ranked WHERE rk <= 5
         |${orderAll("q_id", "neighbor_id", "rk", "cosine")}""".stripMargin)

  private lazy val oracleBase: Map[String, String] = Map(
    "sim_knn_bruteforce" ->
      s"""WITH base AS (
         |  SELECT vec_id, embedding, ${sqlNorm.format("embedding")} AS nrm
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm
         |      FROM base WHERE vec_id % 100 = 0),
         |scored AS (
         |  SELECT q.q_id, b.vec_id,
         |    ${sqlDot.format("b.embedding", "q.q_emb")} / (b.nrm * q.q_nrm) AS cosine
         |  FROM base b CROSS JOIN q WHERE b.vec_id <> q.q_id),
         |ranked AS (
         |  SELECT q_id, vec_id AS neighbor_id, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cosine DESC, vec_id) AS rk
         |  FROM scored)
         |SELECT q_id, neighbor_id, rk, cosine FROM ranked WHERE rk <= 5
         |${orderAll("q_id", "neighbor_id", "rk", "cosine")}""".stripMargin,
    "sim_cosine_lsh" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding, ${sqlNorm.format("embedding")} AS nrm,
         |    (CASE WHEN embedding[1] >= 0 THEN 4 ELSE 0 END
         |     + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
         |     + CASE WHEN embedding[3] >= 0 THEN 1 ELSE 0 END) AS bucket
         |  FROM embeddings)
         |SELECT a.vec_id AS id_a, b2.vec_id AS id_b, a.bucket AS lsh_bucket,
         |  ${sqlDot.format("a.embedding", "b2.embedding")} / (a.nrm * b2.nrm) AS cosine
         |FROM b a JOIN b b2
         |  ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
         |WHERE ${sqlDot.format("a.embedding", "b2.embedding")} / (a.nrm * b2.nrm) >= 0.4
         |${orderAll("id_a", "id_b", "lsh_bucket", "cosine")}""".stripMargin,
    "vec_centroid" ->
      s"""SELECT label, i - 1 AS dim,
         |  ${graft.Tables.sqlDavg("CAST(embedding[i] AS DOUBLE)")} AS centroid,
         |  COUNT(*) AS n
         |FROM embeddings, generate_series(1, 8) AS t(i)
         |GROUP BY label, i
         |${orderAll("label", "dim", "centroid", "n")}""".stripMargin)
}
