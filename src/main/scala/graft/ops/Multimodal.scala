package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Multimodal-column operators (SURVEY.md §2.10): media as opaque binary
  * columns with typed metadata beside them. The decode path is a REAL
  * codec round-trip — payloads are genuine PNGs decoded with the pure-JVM
  * javax.imageio codec ([[MultimodalLib.decodePng]]); the Spark side is
  * the production shape throughout: binary schema, per-partition codec
  * init, feature schema, joins, pruning. Swapping PNG for a JNI codec
  * (JPEG/audio/video) changes no plan.
  */
object Multimodal {
  import Relational.{totalOrder, orderAll}

  /** Wide multimodal frame: text ⋈ embedding on id, JSON props promoted to
    * typed metadata (SURVEY §2.10 multimodal_cols). Column pruning matters
    * on wide rows — the scan must read only what the projection needs. */
  def mmJoin(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark) // VecDotRewrite fuses norm_sq
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

  /** Resize / thumbnail (SURVEY §2.10): stride-sample the payload down to a
    * fixed-width vector — the image-resize analog on the text-as-bytes
    * payload. Pure codegen'd expressions: an 8-slot thumbnail of normalized
    * char codes sampled at stride max(1, len/8). A real image resize swaps
    * the sampling kernel; the plan (project-only, no shuffle) is the point. */
  def mmResize(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "documents")
      .withColumn("stride", greatest(lit(1), floor(length(col("text")) / 8)))
      .select(col("doc_id"), length(col("text")).as("n_chars"),
        transform(sequence(lit(0), lit(7)),
          i => coalesce(
            ascii(substring(col("text"), (i * col("stride") + 1).cast("int"), lit(1)))
              .cast(DoubleType) / 255.0, lit(0.0))).as("thumb"))
      .select(col("doc_id"), col("n_chars"),
        round(element_at(col("thumb"), 1), 6).as("t0"),
        round(element_at(col("thumb"), 4), 6).as("t3"),
        round(element_at(col("thumb"), 8), 6).as("t7")))

  /** Frame sampling (SURVEY §2.10): the video-keyframe analog — split the
    * payload into fixed 32-char frames, keep every 3rd, digest each. The
    * generator explodes a cheap index sequence (never re-evaluating the
    * payload per output row); at scale frames flow straight into the decode
    * stage with no shuffle. */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val frameLen = 32
    totalOrder(load(spark, dir, "documents")
      .withColumn("k", explode(sequence(lit(0),
        floor((length(col("text")) - 1) / frameLen).cast("int"))))
      .filter(col("k") % 3 === 0)
      .withColumn("frame",
        substring(col("text"), (col("k") * frameLen + 1).cast("int"), lit(frameLen)))
      .select(col("doc_id"), col("k").as("frame_idx"),
        length(col("frame")).as("frame_chars"),
        md5(col("frame")).as("frame_digest")))
  }

  // ----------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_cols" -> mmJoin,
    "mm_binary" -> mmBinary,
    "mm_resize" -> mmResize,
    "mm_frame_sample" -> mmFrameSample,
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
         |${orderAll("doc_id", "n_bytes", "digest", "b64_prefix")}""".stripMargin,
    "mm_resize" ->
      s"""WITH t AS (
         |  SELECT doc_id, length(text) AS n_chars, text,
         |    greatest(1, length(text) // 8) AS stride
         |  FROM documents)
         |SELECT doc_id, n_chars,
         |  round(coalesce(ascii(substring(text, CAST(0*stride+1 AS INT), 1)), 0) / 255.0, 6) AS t0,
         |  round(coalesce(ascii(substring(text, CAST(3*stride+1 AS INT), 1)), 0) / 255.0, 6) AS t3,
         |  round(coalesce(ascii(substring(text, CAST(7*stride+1 AS INT), 1)), 0) / 255.0, 6) AS t7
         |FROM t
         |${orderAll("doc_id", "n_chars", "t0", "t3", "t7")}""".stripMargin,
    "mm_frame_sample" ->
      s"""WITH f AS (
         |  SELECT doc_id, text,
         |    unnest(range(0, (length(text)-1) // 32 + 1)) AS k
         |  FROM documents)
         |SELECT doc_id, k AS frame_idx,
         |  length(substring(text, CAST(k*32+1 AS INT), 32)) AS frame_chars,
         |  md5(substring(text, CAST(k*32+1 AS INT), 32)) AS frame_digest
         |FROM f WHERE k % 3 = 0
         |${orderAll("doc_id", "frame_idx", "frame_chars", "frame_digest")}""".stripMargin)
}

/** Typed per-partition media pipeline (the mapPartitions path). */
object MultimodalLib {

  /** One media record: opaque payload + metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], source: String)

  /** Extracted features. */
  case class MediaFeatures(doc_id: Long, source: String, n_bytes: Int,
    width: Int, height: Int, feature: Array[Double])

  /** Image side length for the synthesized payloads. */
  val Side = 16

  /** Render bytes into a REAL grayscale PNG (javax.imageio — pure JVM,
    * no native codecs needed): pixel (x,y) is the input byte at the cyclic
    * offset. This is the payload-synth stage: the fixture has no media
    * column, so the documents' bytes become genuine compressed images. */
  def encodePng(bytes: Array[Byte]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      Side, Side, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < Side * Side) {
      val v = if (bytes.isEmpty) 0 else bytes(i % bytes.length) & 0xff
      raster.setSample(i % Side, i / Side, 0, v)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode: parse the compressed PNG back to pixels; returns
    * (width, height, luminance in [0,1] row-major). Lossless codec ⇒ the
    * round-trip recovers the exact input pixels (asserted in the spec). */
  def decodePng(payload: Array[Byte]): (Int, Int, Array[Double]) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val px = new Array[Double](w * h)
    var i = 0
    while (i < px.length) {
      px(i) = raster.getSample(i % w, i / w, 0) / 255.0
      i += 1
    }
    (w, h, px)
  }

  /** Per-partition decode + featurize over the binary column: payloads are
    * real PNGs (synth stage above) decoded with one ImageIO context per
    * partition — the expensive-init pattern for codecs/models — streaming
    * through rows without collecting. Features are pixel-derived (mean /
    * min / max luminance), so they are codec-version independent. Rows-only
    * check (a PNG codec is not SQL-expressible); the spec pins determinism,
    * partition-shape independence, and exact round-trip fidelity. */
  def mmDecodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val recs = load(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        col("source"))
      .as[MediaRecord]
    // stage 1: payload synth — document bytes rendered into real PNGs
    val media = recs.mapPartitions(_.map(r =>
      r.copy(payload = encodePng(r.payload))))
    // stage 2: decode + featurize (per-partition codec init lives here)
    val out = media.mapPartitions { it =>
      it.map { r =>
        val (w, h, px) = decodePng(r.payload)
        MediaFeatures(r.doc_id, r.source, r.payload.length, w, h,
          Array(px.sum / px.length, px.min, px.max))
      }
    }
    Relational.totalOrder(out.toDF()
      .select(col("doc_id"), col("source"), col("n_bytes"),
        col("width"), col("height"),
        round(element_at(col("feature"), 1), 6).as("f0"),
        round(element_at(col("feature"), 2), 6).as("f_min"),
        round(element_at(col("feature"), 3), 6).as("f_max")))
  }
}
