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
    // cached: map-only md5/base64 child, sort sampling would run it twice
    totalOrder(load(spark, dir, "documents")
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("digest"),
        substring(base64(col("payload")), 1, 16).as("b64_prefix"))
      .transform(graft.OpCaches.cached))

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
        round(element_at(col("thumb"), 8), 6).as("t7"))
      // cached: map-only substring-sampling child, sort sampling would
      // run it twice
      .transform(graft.OpCaches.cached))

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

  /** Image perceptual-hash near-dup (SURVEY §2.10): the multimodal twin of
    * [[Dedup.dedupSimhashPairs]]. Stage 1 synthesizes a REAL 16×16 PNG per
    * document from its zero-padded 256-byte prefix (position-aligned, so
    * documents sharing a prefix render near-identical images), decodes it
    * with the javax.imageio codec, 2×2-averages the luma into an 8×8 grid
    * and takes the 64-bit dHash (bit = cell brighter than its right
    * neighbor — gradient-based, discriminative even on the fixture's
    * near-uniform text-derived luma where aHash collapses) — all inside
    * the one per-partition codec pass, no shuffle. Stage 2 is pure
    * DataFrame: 4×16-bit Hamming-LSH bands (two hashes within distance 3
    * agree on ≥1 band by pigeonhole), 64-doc bucket cap, exact
    * popcount-of-XOR verify at ≤ 3. Fully hash-oracled ([[phashPairCtes]]
    * recomputes the synthesized pixels from the text bytes), plus a
    * recall/precision spec vs the exact pixel compare. */
  def mmPhashPairs(spark: SparkSession, dir: String): DataFrame =
    totalOrder(phashPairs(spark,
      load(spark, dir, "documents").select(col("doc_id"), col("text"))))

  /** The banding/verify pipeline over any (doc_id, text) frame — split out
    * so the spec can feed constructed duplicates through the same path. */
  private[graft] def phashPairs(spark: SparkSession, docs: DataFrame): DataFrame = {
    val kept = phashBandRows(spark, docs).filter(col("cnt") <= 64)
    val cand = kept.as("a").join(kept.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.phash").as("ph_a"), col("b.phash").as("ph_b"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("ph_a").bitwiseXOR(col("ph_b"))))
      .filter(col("hamming") <= 3)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** The pre-cap band rows of [[phashPairs]] — (doc_id, phash, band, key,
    * cnt); the pair op keeps cnt ≤ 64, the cap-stats audit aggregates the
    * whole frame. */
  private[graft] def phashBandRows(spark: SparkSession, docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val sigs = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, MultimodalLib.dHash64(text))
      }).toDF("doc_id", "phash")
    val bands = sigs.select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("key",
        expr("shiftright(phash, CAST(band * 16 AS INT)) & 65535"))
    val wB = Window.partitionBy(col("band"), col("key"))
    bands.withColumn("cnt", count(lit(1)).over(wB))
  }

  /** Cap-drop accounting for [[mmPhashPairs]]' Hamming-LSH bands (the "no
    * silent caps" audit family — see [[Dedup.dedupSimhashCapStats]]): band
    * rows, rows in over-cap buckets (dropped for that band), and the
    * candidate-pair mass those buckets carried. Hash-oracled over
    * [[phashCtes]]; the spec asserts the fixture leaves the cap untouched
    * and that a constructed hot bucket is counted, not silently lost. */
  def mmPhashCapStats(spark: SparkSession, dir: String): DataFrame =
    totalOrder(phashBandRows(spark,
      load(spark, dir, "documents").select(col("doc_id"), col("text"))).agg(
      count(lit(1)).as("n_band_rows"),
      coalesce(sum(when(col("cnt") > 64, 1L).otherwise(0L)), lit(0L))
        .as("n_dropped_rows"),
      coalesce(expr("CAST(sum(CASE WHEN cnt > 64 THEN cnt - 1 ELSE 0 END) " +
        "DIV 2 AS BIGINT)"), lit(0L)).as("n_dropped_pairs")))

  /** Image-dup survivorship — [[mmPhashPairs]] fed through the SHARED
    * min-id connected-components engine ([[Dedup.clusterSurvivorship]]):
    * every pair family in the engine ends in the same cluster/survivor
    * view, and the visual signal is no exception. Canonical survivor = the
    * smallest doc_id of each phash component; the pair graph is lineage-cut
    * before the iterative propagation (the dedup_clusters discipline).
    * Hash-oracled (the recursive-walk CC over [[phashPairCtes]]), with the
    * consistency spec proving pair endpoints always share a canonical id. */
  def mmPhashClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = phashPairs(spark,
      load(spark, dir, "documents").select(col("doc_id"), col("text")))
      .select(col("id_a"), col("id_b"))
      .transform(graft.Tables.lineageCut)
    totalOrder(Dedup.clusterSurvivorship(spark, pairs, "doc_id"))
  }

  // ----------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_cols" -> mmJoin,
    "mm_binary" -> mmBinary,
    "mm_resize" -> mmResize,
    "mm_frame_sample" -> mmFrameSample,
    "mm_decode_features" -> MultimodalLib.mmDecodeFeatures _,
    "mm_phash_pairs" -> mmPhashPairs,
    "mm_phash_clusters" -> mmPhashClusters,
    "mm_phash_cap_stats" -> mmPhashCapStats)

  /** DuckDB twin of the synthesized-pixel → luma-grid → dHash chain (the
    * round-12 verdict #2 graduation): the pixels [[MultimodalLib.encodePngPrefix]]
    * renders are a pure function of the document bytes — pixel i = byte i
    * of the UTF-8 text, zero-padded — so the oracle recomputes them from
    * `hex(encode(text))` byte extraction (the Md5Words hex-word idiom),
    * then the 8×8 2×2-mean luma grid and the 64 row-cyclic gradient bits
    * with the IDENTICAL IEEE operand order the decoded-pixel path uses.
    * The Spark side still runs the REAL encode→PNG→decode codec
    * round-trip, so any codec corruption now lands as a hash mismatch.
    * Ends in `bc(doc_id, band, key, bits, cnt)` — the pre-cap band rows. */
  private def phashCtes: String =
    s"""hx AS (
       |  SELECT doc_id, hex(encode(text)) AS h,
       |    CAST(octet_length(encode(text)) AS INT) AS L
       |  FROM documents),
       |px AS (
       |  SELECT doc_id,
       |    list_transform(range(0, 256), i ->
       |      CASE WHEN i < L THEN
       |        CAST(('0x' || substring(h, CAST(2*i+1 AS INT), 2))::UBIGINT
       |          AS DOUBLE) / 255.0
       |      ELSE 0.0 END) AS p
       |  FROM hx),
       |lg AS (
       |  SELECT doc_id,
       |    list_transform(range(0, 64), j ->
       |      (p[CAST(32*(j//8) + 2*(j%8) + 1 AS INT)]
       |       + p[CAST(32*(j//8) + 2*(j%8) + 2 AS INT)]
       |       + p[CAST(32*(j//8) + 2*(j%8) + 17 AS INT)]
       |       + p[CAST(32*(j//8) + 2*(j%8) + 18 AS INT)]) / 4.0) AS g
       |  FROM px),
       |bt AS (
       |  SELECT doc_id,
       |    list_transform(range(0, 64), j ->
       |      CASE WHEN g[CAST(j+1 AS INT)]
       |          > g[CAST((j//8)*8 + ((j%8)+1)%8 + 1 AS INT)]
       |        THEN 1 ELSE 0 END) AS bits
       |  FROM lg),
       |bk AS (
       |  SELECT doc_id, b.band,
       |    CAST(list_aggregate(list_transform(range(0, 16), t ->
       |      bits[CAST(b.band*16 + t + 1 AS INT)]
       |        * (1::BIGINT << CAST(t AS INT))), 'sum') AS BIGINT) AS key,
       |    bits
       |  FROM bt, (SELECT unnest(range(0, 4)) AS band) AS b),
       |bc AS (
       |  SELECT doc_id, band, key, bits,
       |    COUNT(*) OVER (PARTITION BY band, key) AS cnt
       |  FROM bk)""".stripMargin

  /** The capped band-bucket pair stage over [[phashCtes]] — ends in
    * `phpairs(id_a, id_b, hamming)`, the ≤3-Hamming verified near-dups. */
  private def phashPairCtes: String =
    s"""$phashCtes,
       |kept AS (SELECT * FROM bc WHERE cnt <= 64),
       |phcand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    a.bits AS bits_a, b.bits AS bits_b
       |  FROM kept a JOIN kept b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |phpairs AS (
       |  SELECT id_a, id_b,
       |    CAST(len(list_filter(range(0, 64), j ->
       |      bits_a[CAST(j+1 AS INT)] <> bits_b[CAST(j+1 AS INT)]))
       |      AS INT) AS hamming
       |  FROM phcand
       |  WHERE len(list_filter(range(0, 64), j ->
       |    bits_a[CAST(j+1 AS INT)] <> bits_b[CAST(j+1 AS INT)])) <= 3)"""
      .stripMargin

  val oracle: Map[String, String] = Map(
    "mm_decode_features" ->
      s"""WITH hx AS (
         |  SELECT doc_id, source, hex(encode(text)) AS h,
         |    CAST(octet_length(encode(text)) AS INT) AS L
         |  FROM documents),
         |px AS (
         |  SELECT doc_id, source, L,
         |    list_transform(range(0, 256), i ->
         |      CASE WHEN L = 0 THEN 0.0
         |      ELSE CAST(('0x' || substring(h, CAST(2*(i % L)+1 AS INT), 2))
         |        ::UBIGINT AS DOUBLE) / 255.0 END) AS p
         |  FROM hx)
         |SELECT doc_id, source, L AS n_bytes,
         |  CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
         |  round(list_aggregate(p, 'sum') / 256, 6) AS f0,
         |  round(list_aggregate(p, 'min'), 6) AS f_min,
         |  round(list_aggregate(p, 'max'), 6) AS f_max
         |FROM px
         |${orderAll("doc_id", "source", "n_bytes", "width", "height",
              "f0", "f_min", "f_max")}""".stripMargin,
    "mm_phash_pairs" ->
      s"""WITH $phashPairCtes
         |SELECT id_a, id_b, hamming FROM phpairs
         |${orderAll("id_a", "id_b", "hamming")}""".stripMargin,
    "mm_phash_cap_stats" ->
      s"""WITH $phashCtes
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_band_rows,
         |  CAST(COALESCE(SUM(CASE WHEN cnt > 64 THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_dropped_rows,
         |  CAST(COALESCE(SUM(CASE WHEN cnt > 64 THEN cnt - 1 ELSE 0 END), 0)
         |    // 2 AS BIGINT) AS n_dropped_pairs
         |FROM bc
         |${orderAll("n_band_rows", "n_dropped_rows", "n_dropped_pairs")}"""
        .stripMargin,
    "mm_phash_clusters" ->
      s"""WITH RECURSIVE $phashPairCtes,
         |edges AS (
         |  SELECT id_a AS a, id_b AS b FROM phpairs
         |  UNION ALL
         |  SELECT id_b, id_a FROM phpairs),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |walk AS (
         |  SELECT id, id AS lbl FROM nodes
         |  UNION
         |  SELECT e.a AS id, w.lbl FROM walk w JOIN edges e ON e.b = w.id),
         |labels AS (SELECT id, MIN(lbl) AS canonical_id FROM walk GROUP BY id),
         |csizes AS (
         |  SELECT canonical_id, COUNT(*) AS cluster_size
         |  FROM labels GROUP BY canonical_id)
         |SELECT l.id AS doc_id, l.canonical_id, s.cluster_size,
         |  l.id = l.canonical_id AS is_survivor
         |FROM labels l JOIN csizes s USING (canonical_id)
         |${orderAll("doc_id", "canonical_id", "cluster_size",
              "is_survivor")}""".stripMargin,
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

  // ImageIO's default stream cache is DISK-backed: every read()/write()
  // call creates and deletes a temp FILE (FileCacheImage{Input,Output}
  // Stream) — thousands of filesystem round-trips per query for 16×16
  // payloads, and the source of multi-second run-to-run variance on the
  // mm_* ops. Heap-backed streams decode the same bytes to the same
  // pixels; this is plumbing, not semantics. JVM-global, set once at
  // first use of the codec on driver and executors alike.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** Position-aligned payload synth for the perceptual hash: pixel (x, y)
    * is byte `y·16+x` of the UTF-8 text, zero-padded past the end (NOT
    * cyclic — prefix-sharing documents must render prefix-identical
    * images). */
  def encodePngPrefix(text: String): Array[Byte] = {
    val bytes = text.getBytes("UTF-8")
    val img = new java.awt.image.BufferedImage(
      Side, Side, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < Side * Side) {
      raster.setSample(i % Side, i / Side, 0,
        if (i < bytes.length) bytes(i) & 0xff else 0)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 8×8 luma grid of a decoded 16×16 image: 2×2 block means in [0,1]. */
  def lumaGrid8(px: Array[Double], w: Int): Array[Double] = {
    val g = new Array[Double](64)
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        g(gy * 8 + gx) = (px((2 * gy) * w + 2 * gx) +
          px((2 * gy) * w + 2 * gx + 1) +
          px((2 * gy + 1) * w + 2 * gx) +
          px((2 * gy + 1) * w + 2 * gx + 1)) / 4.0
        gx += 1
      }
      gy += 1
    }
    g
  }

  /** 64-bit dHash of a document's synthesized image: encode the prefix
    * PNG, DECODE it back through the real codec (the lossless round-trip
    * is the point — the hash is computed from decoded pixels, exactly as
    * it would be on genuine media), 8×8 the luma, bit = cell brighter
    * than its right neighbor (row-cyclic). */
  def dHash64(text: String): Long = {
    val (w, _, px) = decodePng(encodePngPrefix(text))
    val g = lumaGrid8(px, w)
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 8 + x) > g(y * 8 + (x + 1) % 8)) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Media record mid-pipeline: the synthesized PNG plus the RAW payload
    * size it encodes (the compressed size is a codec-version artifact; the
    * raw size is the media property a feature store keeps). */
  case class MediaEncoded(doc_id: Long, payload: Array[Byte], source: String,
    n_raw: Int)

  /** Per-partition decode + featurize over the binary column: payloads are
    * real PNGs (synth stage above) decoded with one ImageIO context per
    * partition — the expensive-init pattern for codecs/models — streaming
    * through rows without collecting. Features are pixel-derived (mean /
    * min / max luminance), so they are codec-version independent — which
    * is also what makes the op fully ORACLE-ABLE: the synthesized pixels
    * are a pure function of the document bytes, so DuckDB recomputes every
    * feature from `hex(encode(text))` byte extraction while the Spark side
    * goes through the REAL encode→PNG→decode round-trip; a codec bug now
    * breaks the hash match instead of hiding behind a rows-only check
    * (round-12 verdict #2). The spec additionally pins determinism,
    * partition-shape independence, and exact round-trip fidelity. */
  def mmDecodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val recs = load(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        col("source"))
      .as[MediaRecord]
    // stage 1: payload synth — document bytes rendered into real PNGs
    val media = recs.mapPartitions(_.map(r =>
      MediaEncoded(r.doc_id, encodePng(r.payload), r.source,
        r.payload.length)))
    // stage 2: decode + featurize (per-partition codec init lives here)
    val out = media.mapPartitions { it =>
      it.map { r =>
        val (w, h, px) = decodePng(r.payload)
        MediaFeatures(r.doc_id, r.source, r.n_raw, w, h,
          Array(px.sum / px.length, px.min, px.max))
      }
    }
    // cache before the total-order sort: the sort's range-sampling pass
    // re-executes its child, and this child is the map-only double codec
    // round-trip — without the cache every payload encodes+decodes TWICE
    Relational.totalOrder(out.toDF()
      .select(col("doc_id"), col("source"), col("n_bytes"),
        col("width"), col("height"),
        round(element_at(col("feature"), 1), 6).as("f0"),
        round(element_at(col("feature"), 2), 6).as("f_min"),
        round(element_at(col("feature"), 3), 6).as("f_max"))
      .transform(graft.OpCaches.cached))
  }
}
