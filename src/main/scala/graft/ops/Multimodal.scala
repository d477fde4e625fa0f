package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Multimodal-column operators (SURVEY.md §2.10): media as opaque binary
  * columns with typed metadata beside them. The container has no image/
  * audio codecs, so the decode step is a clearly-marked deterministic STUB
  * ([[MultimodalLib.decodeStub]]) — but everything Spark-side is real:
  * binary schema, per-partition batch processing, feature schema, joins,
  * and pruning. Swapping the stub for a JNI/codec call changes no plan.
  */
object Multimodal {
  import Relational.{totalOrder, orderAll}

  /** Wide multimodal frame: text ⋈ embedding on id, JSON props promoted to
    * typed metadata (SURVEY §2.10 multimodal_cols). Column pruning matters
    * on wide rows — the scan must read only what the projection needs. */
  def mmJoin(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    val emb = load(spark, dir, "embeddings")
      .withColumn("norm_sq", aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))
    totalOrder(docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("label"), size(col("embedding")).as("dim"), col("norm_sq")))
  }

  /** Binary-column pipeline: text bytes stand in for media payloads —
    * cast to binary, then size / digest / base64-prefix features, all
    * codegen'd (SURVEY §2.10). At scale the binary column lives in its own
    * parquet column chunk and is never read unless projected. */
  def mmBinary(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "documents")
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("digest"),
        substring(base64(col("payload")), 1, 16).as("b64_prefix")))

  // ----------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_cols" -> mmJoin,
    "mm_binary" -> mmBinary,
    "mm_decode_features" -> MultimodalLib.mmDecodeFeatures _)

  val oracle: Map[String, String] = Map(
    "multimodal_cols" ->
      s"""SELECT doc_id, lang, source, n_chars, label,
         |  len(embedding) AS dim,
         |  list_aggregate(list_transform(embedding,
         |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS norm_sq
         |FROM documents JOIN embeddings ON doc_id = vec_id
         |${orderAll("doc_id", "lang", "source", "n_chars", "label", "dim", "norm_sq")}""".stripMargin,
    "mm_binary" ->
      s"""SELECT doc_id,
         |  octet_length(encode(text)) AS n_bytes,
         |  md5(text) AS digest,
         |  substring(to_base64(encode(text)), 1, 16) AS b64_prefix
         |FROM documents
         |${orderAll("doc_id", "n_bytes", "digest", "b64_prefix")}""".stripMargin)
}

/** Typed per-partition media pipeline (the mapPartitions path). */
object MultimodalLib {

  /** One media record: opaque payload + metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], source: String)

  /** Extracted features. */
  case class MediaFeatures(doc_id: Long, source: String, n_bytes: Int,
    head_sum: Long, feature: Array[Double])

  /** STUB decoder — deterministic fake standing in for an image/audio codec
    * (none exists in this container). Real semantics it preserves: consumes
    * raw bytes, returns a fixed-width feature vector. Swap the body for a
    * real decode without touching the pipeline. */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    val f = new Array[Double](4)
    var i = 0
    while (i < payload.length) {
      f(i % 4) += (payload(i) & 0xff).toDouble / 255.0
      i += 1
    }
    f
  }

  /** Per-partition decode + featurize over the binary column: one decoder
    * instance per partition (the expensive-init pattern for codecs/models),
    * streaming through rows without collecting. Rows-only check (the stub
    * is not SQL-expressible); the spec pins determinism and batch shape. */
  def mmDecodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val recs = load(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        col("source"))
      .as[MediaRecord]
    val out = recs.mapPartitions { it =>
      // per-partition init would go here (codec handle, model session)
      it.map { r =>
        val feat = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.source, r.payload.length,
          r.payload.take(8).map(b => (b & 0xffL)).sum, feat)
      }
    }
    Relational.totalOrder(out.toDF()
      .select(col("doc_id"), col("source"), col("n_bytes"), col("head_sum"),
        round(element_at(col("feature"), 1), 6).as("f0")))
  }
}
