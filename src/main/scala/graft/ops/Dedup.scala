package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Deduplication operators for LLM training-data pipelines (SURVEY.md
  * §2.10): exact, n-gram Jaccard (inverted-index candidate generation),
  * MinHash+LSH banding, and SimHash. The 100 TB design rule everywhere:
  * never materialize O(n²) — candidates come from shared-key joins
  * (shingle, band bucket) whose fan-out is bounded, and only candidates
  * pay the exact-verification cost.
  */
object Dedup {
  import Relational.{totalOrder, orderAll}

  /** Word 3-gram shingle set per document (distinct). */
  private def shingled(spark: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(lower(col("text")), "[^a-z0-9']+"), t => t =!= "")
    load(spark, dir, "documents")
      .withColumn("t", toks)
      // guard: under ANSI mode element_at past the end errors, so docs with
      // <3 tokens get an empty shingle set instead of an implicit null-pad
      .withColumn("shingles", when(size(col("t")) >= 3,
        array_distinct(transform(
          sequence(lit(0), size(col("t")) - 3),
          i => concat_ws(" ",
            element_at(col("t"), i + 1),
            element_at(col("t"), i + 2),
            element_at(col("t"), i + 3)))))
        .otherwise(array().cast("array<string>")))
      .select(col("doc_id"), col("shingles"))
  }

  /** Exact dedup: group by content hash of normalized text; the canonical
    * survivor is the lowest doc_id (SURVEY §2.10 dedup_exact). Shuffles
    * 32-byte hashes, never the documents themselves. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "documents")
      .withColumn("h",
        sha2(regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 256))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_dups"))
      .filter(col("n_dups") >= 2))

  /** Near-dup pairs by exact n-gram Jaccard, candidates via inverted index:
    * explode shingles → self-join on shingle (only docs sharing ≥1 shingle
    * ever meet) → per-pair intersection count → Jaccard filter. The
    * candidate join is keyed by shingle, so cost is Σ df(shingle)², not n²;
    * a stop-shingle cap (df ≤ 100) bounds the worst key — the standard
    * guard at corpus scale. */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingled(spark, dir)
    val sizes = sh.select(col("doc_id"), size(col("shingles")).as("n_sh"))
    val posting = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val capped = posting.withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))))
      .filter(col("df") <= 100)
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    totalOrder(pairs
      .join(sizes.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard", col("inter").cast(DoubleType) /
        (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= 0.3)
      .select(col("id_a"), col("id_b"), col("inter"), col("jaccard")))
  }

  /** MinHash + LSH banding (SURVEY §2.10 dedup_minhash): 16 xxhash64-based
    * min-hashes per doc, 4 bands × 4 rows; docs sharing any band bucket are
    * candidates; candidates are verified by exact Jaccard ≥ 0.3. Banding
    * bounds the pair explosion (P[candidate] ≈ 1-(1-j⁴)⁴); xxhash64 is
    * engine-specific → rows-only check + precision/recall spec vs the
    * exact op. */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingled(spark, dir)
    val sig = sh.withColumn("sig", transform(
      sequence(lit(0), lit(15)),
      seed => array_min(transform(col("shingles"),
        s => xxhash64(concat(seed.cast("string"), lit(":"), s))))))
    val bands = sig.select(col("doc_id"), col("sig"),
        explode(transform(sequence(lit(0), lit(3)),
          b => struct(b.as("band"),
            xxhash64(concat_ws("_", b,
              element_at(col("sig"), b * 4 + 1),
              element_at(col("sig"), b * 4 + 2),
              element_at(col("sig"), b * 4 + 3),
              element_at(col("sig"), b * 4 + 4))).as("bucket")))).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // exact verification of the candidate set only
    val sizes = sh.select(col("doc_id"), col("shingles"))
    totalOrder(cand
      .join(sizes.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("shingles", "sh_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("shingles", "sh_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast(DoubleType) /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= 0.3)
      .select(col("id_a"), col("id_b"), col("jaccard")))
  }

  /** SimHash (SURVEY §2.10 dedup_simhash): 63-bit signature by per-bit
    * majority vote over token hashes (bit 63 dropped so the power-of-two
    * sum stays within a signed long under ANSI overflow checking).
    * Explodes tokens×63 bits into a hash agg — one shuffle keyed by
    * (doc, bit); no signature ever compares to more than its bucket.
    * Rows-only + spec (identical docs ⇒ identical simhash; bucket = top
    * 16 bits for grouping). */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(lower(col("text")), "[^a-z0-9']+"), t => t =!= "")
    val bits = load(spark, dir, "documents")
      .select(col("doc_id"), explode(array_distinct(toks)).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
      .select(col("doc_id"), explode(transform(sequence(lit(0), lit(62)),
        // call_function: the shiftright(Column, Int) overload can't take a
        // lambda variable as the shift amount
        b => struct(b.as("bit"),
          when(call_function("shiftright", col("h"), b).bitwiseAND(1) === 1, 1)
            .otherwise(-1).as("vote")))).as("bv"))
      .select(col("doc_id"), col("bv.bit"), col("bv.vote"))
    totalOrder(bits.groupBy(col("doc_id"), col("bit"))
      .agg(sum(col("vote")).as("v"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("v") > 0,
        call_function("shiftleft", lit(1L), col("bit"))).otherwise(0L)).as("simhash"))
      .withColumn("bucket16", shiftright(col("simhash"), 48))
      .select(col("doc_id"), col("simhash"), col("bucket16")))
  }

  // ----------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_minhash" -> dedupMinhash,
    "dedup_simhash" -> dedupSimhash)

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      s"""SELECT sha256(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS h,
         |  MIN(doc_id) AS canonical_id, COUNT(*) AS n_dups
         |FROM documents
         |GROUP BY 1 HAVING COUNT(*) >= 2
         |${orderAll("h", "canonical_id", "n_dups")}""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH tok AS (
         |  SELECT doc_id, list_filter(
         |    regexp_split_to_array(lower(text), '[^a-z0-9'']+'), t -> t <> '') AS t
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    range(1, greatest(len(t) - 2, 1) + 1),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
         |  FROM tok),
         |posting AS (
         |  SELECT doc_id, unnest(s) AS sh FROM sh),
         |capped AS (
         |  SELECT * FROM (
         |    SELECT doc_id, sh, COUNT(*) OVER (PARTITION BY sh) AS df
         |    FROM posting) WHERE df <= 100),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
         |  FROM capped a JOIN capped b
         |    ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, inter,
         |  CAST(inter AS DOUBLE) / (sa.n_a + sb.n_b - inter) AS jaccard
         |FROM pairs
         |JOIN (SELECT doc_id, len(s) AS n_a FROM sh) sa ON sa.doc_id = id_a
         |JOIN (SELECT doc_id, len(s) AS n_b FROM sh) sb ON sb.doc_id = id_b
         |WHERE CAST(inter AS DOUBLE) / (sa.n_a + sb.n_b - inter) >= 0.3
         |${orderAll("id_a", "id_b", "inter", "jaccard")}""".stripMargin)
}
