package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis operators for LLM training-data pipelines (SURVEY.md §2.10;
  * driver extension scope): tokenization + term frequency, token counting
  * (whitespace and BPE-ish regex), language identification (stopword n-gram
  * heuristic), quality scoring, and content fingerprinting.
  *
  * All pure codegen'd expressions — `explode` is Spark's Generator (UDTF
  * surface, SURVEY §2.9); the token shuffle is keyed by token, so term
  * aggregation scales like any hash agg. At 100 TB the only change is
  * bucketing the documents table by doc_id.
  */
object Text {
  import Relational.{totalOrder, orderAll}

  /** Word tokens: split on any non-[a-z0-9'] run after lowercasing.
    * THE canonical tokenizer — `private[ops]` so sibling families
    * (Pipeline's datasheet/packing ops) reuse it instead of inlining the
    * regex, keeping their token counts reconciliation-exact with the
    * text ops by construction. */
  private val TokenPattern = "[^a-z0-9']+"

  private[graft] def tokens(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), TokenPattern), t => t =!= "")

  /** Term frequency across the corpus (explode → hash agg, SURVEY §2.10
    * text_tokenize_tf). doc_freq counts distinct docs per token. */
  def textTokenizeTf(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "documents")
      // materialize the token array before exploding: Generate re-evaluates
      // its child per output row, which would re-split the text per token
      .select(col("doc_id"), tokens(col("text")).as("toks")).transform(graft.OpCaches.cached)
      .select(col("doc_id"), explode(col("toks")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df")))

  /** BPE vocabulary training, first merge iteration: corpus-wide counts of
    * ADJACENT token pairs — the argmax of this table is the merge every BPE
    * trainer performs next; iterating (merge, recount) yields the full
    * vocabulary. One partial-aggregated count over exploded (tokᵢ, tokᵢ₊₁)
    * postings — the shuffle key is the pair string, never the document; at
    * 100 TB this is a textbook map-side-combine aggregation. Top pairs only
    * (count ≥ 5) to keep the demo output bounded; the cut is on the
    * POST-aggregation table, so the plan is identical without it. */
  def textBpePairs(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("t")).transform(graft.OpCaches.cached)
      .filter(size(col("t")) >= 2)
      .select(explode(transform(
        sequence(lit(0), size(col("t")) - 2),
        i => struct(element_at(col("t"), i + 1).as("a"),
          element_at(col("t"), i + 2).as("b")))).as("p"))
      .groupBy(col("p.a").as("left_tok"), col("p.b").as("right_tok"))
      .agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= 5))

  /** BPE-APPLY tokenization: the top-[[BpeMerges]] merges ranked by
    * [[textBpePairs]]' pair statistics (count desc, then textual — an
    * engine-deterministic priority list) applied to every document,
    * closing the train→encode loop: `n_bpe_tokens` is a real merge-aware
    * count, not a whitespace proxy, and feeds
    * [[Pipeline.pipelinePackSequences]]-style token budgets.
    *
    * Encoding is a fold over the RANKED merge list with the document as a
    * DOUBLE-space-joined token string (`" t1  t2  ...  tn "`): applying
    * merge (a,b) is ONE plain string replace of `" a  b "` with
    * `" a_b "`. String replace is left-to-right non-overlapping in both
    * engines — exactly BPE's per-merge scan ("a a a" under merge (a,a)
    * yields [a_a, a], never [a_a, a_a]) — and the double-space join keeps
    * ADJACENT occurrences independent: each match consumes one boundary
    * space from either margin, leaving the neighbor's own margin intact,
    * so "a b a b" merges to [a_b, a_b] in the single pass. '_' never
    * occurs in a token ([[TokenPattern]] keeps [a-z0-9'] only), so merged
    * tokens cannot collide with base ones, and later merges see earlier
    * ones' output (an occurrence consumed by a higher-priority merge is
    * gone) — the greedy BPE contract. No regex anywhere, so the fold is
    * byte-identical across engines; DuckDB mirrors it with list_reduce
    * over the same ranked list. One corpus pass for the pair stats (the
    * textBpePairs hash agg), one broadcast of the ≤[[BpeMerges]]-entry
    * list, one per-row fold — nothing else shuffles. */
  def textBpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .transform(graft.OpCaches.cached)
    val pairCounts = docs.filter(size(col("t")) >= 2)
      .select(explode(transform(
        sequence(lit(0), size(col("t")) - 2),
        i => struct(element_at(col("t"), i + 1).as("a"),
          element_at(col("t"), i + 2).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("c"))
    // ranked merge list as "a b" strings: sort_array over (-count, a, b)
    // structs gives (count desc, a asc, b asc) — deterministic ties
    val merges = pairCounts
      .agg(slice(sort_array(collect_list(struct((-col("c")).as("nc"),
        col("a"), col("b")))), 1, BpeMerges).as("ms"))
      .select(transform(col("ms"),
        m => concat_ws(" ", m.getField("a"), m.getField("b"))).as("merges"))
    // cached: the encode fold (BpeMerges string replaces over the whole
    // document) is map-only — without this the sort's sampling pass runs
    // every fold twice
    totalOrder(bpeApply(docs, merges).drop("encoded").withColumn("n_merged",
      col("n_ws_tokens") - col("n_bpe_tokens"))
      .transform(graft.OpCaches.cached))
  }

  /** The encode fold of [[textBpeEncode]], split out so the spec can feed
    * constructed token arrays and merge lists through the exact production
    * path: `docs` is (doc_id, t array<string>), `merges` a 1-row frame
    * with a `merges` array<string> of "a b" entries in priority order. */
  private[graft] def bpeApply(docs: DataFrame, merges: DataFrame): DataFrame =
    docs.crossJoin(broadcast(merges))
      .withColumn("base",
        concat(lit(" "), array_join(col("t"), "  "), lit(" ")))
      .withColumn("enc", expr(
        """aggregate(merges, base, (acc, m) -> replace(acc,
          |  ' ' || split_part(m, ' ', 1) || '  ' || split_part(m, ' ', 2) || ' ',
          |  ' ' || split_part(m, ' ', 1) || '_' || split_part(m, ' ', 2) || ' '))"""
          .stripMargin))
      .select(col("doc_id"), size(col("t")).cast("long").as("n_ws_tokens"),
        when(size(col("t")) === 0, 0L)
          .otherwise(size(split(trim(col("enc")), "  ")).cast("long"))
          .as("n_bpe_tokens"),
        when(size(col("t")) === 0, lit(""))
          .otherwise(trim(col("enc"))).as("encoded"))

  /** Merge-list size for [[textBpeEncode]] — enough to exercise chained
    * merges on the fixture while keeping the broadcast list trivial. */
  private val BpeMerges = 32

  /** Per-document token counts: whitespace tokens and a BPE-ish regex
    * (contractions / word / number / punct-run classes). */
  def textTokenCount(spark: SparkSession, dir: String): DataFrame = {
    val bpe = "'(?:s|d|m|t|ll|ve|re)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+"
    totalOrder(load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        // fused run-count: the token array existed only to be size()d
        graft.functions.GraftFunctions.tokenCount(spark, lower(col("text")))
          .cast("int").as("n_ws_tokens"),
        size(regexp_extract_all(lower(col("text")), lit(bpe), lit(0)))
          .as("n_bpe_tokens")))
  }

  /** Quality scoring (length / punctuation / stopword ratios): the standard
    * pre-training filter features. All ratios are integer-count / integer-
    * count divisions, so the doubles are engine-independent. */
  def textQuality(spark: SparkSession, dir: String): DataFrame =
    totalOrder(qualityFrame(spark, dir))

  /** Unsorted quality frame, reused by [[Pipeline.pipelineCurate]]. */
  private[ops] def qualityFrame(spark: SparkSession, dir: String): DataFrame = {
    // the three feature counts are fused byte-walks (ONE pass each, no
    // regex engine, no match/token arrays — graft.functions.TextCounts),
    // bit-identical to the regexp formulations the DuckDB oracle keeps:
    // stopPat = \b(the|a|and|of|to|in|is|for|on|it)\b over lower(text),
    // punct = [^a-z0-9\s'] over the RAW text (uppercase counts)
    import graft.functions.GraftFunctions.{punctCount, stopCount, tokenCount}
    (load(spark, dir, "documents")
      .withColumn("n_tokens",
        tokenCount(spark, lower(col("text"))).cast(DoubleType))
      .withColumn("n_stop",
        stopCount(spark, lower(col("text"))).cast(DoubleType))
      .withColumn("n_punct",
        punctCount(spark, col("text")).cast(DoubleType))
      .select(col("doc_id"), col("n_chars"), col("n_tokens"),
        (col("n_stop") / col("n_tokens")).as("stop_ratio"),
        (col("n_punct") / col("n_chars")).as("punct_ratio"),
        (col("n_chars") / col("n_tokens")).as("chars_per_token"),
        ((col("n_stop") / col("n_tokens")) * 0.5
          - (col("n_punct") / col("n_chars")) * 0.3
          + when(col("n_tokens") >= 20.0, 0.2).otherwise(0.0)).as("quality")))
  }

  /** Flesch–Kincaid grade-level readability (Kincaid et al. '75) — the
    * classic complexity feature corpus-quality stacks report next to the
    * ratio features: 0.39·(words/sentence) + 11.8·(syllables/word) − 15.59.
    * Sentences are [.!?]+ runs (min 1); syllables use the standard
    * vowel-group heuristic — per word, the count of [aeiouy]+ runs, min 1 —
    * computed by the fused [[graft.functions.SyllableSum]] codegen
    * expression over the shared token split (ONE byte-walk per row; the
    * prior transform+aggregate fold paid a regex invocation and a matched-
    * substring array allocation per WORD — round-12 verdict #6 flagged it
    * as the largest per-row constant on the linear surface), so the whole
    * op is per-row expressions with zero shuffle (the cheapest 100 TB
    * pass, like the quality scorer it complements). All three counts are
    * exact integers; the grade is the identical mul/add/sub/divide
    * expression in both engines, so the doubles are determinate and the
    * op is fully oracled. */
  def textReadability(spark: SparkSession, dir: String): DataFrame =
    // shape rules, measured at sf1 (6.5 s → 1.9 s min-of-3): (1) ALL
    // consumers of `words` live in ONE projection with no intervening
    // Filter — physical-projection subexpression elimination then runs
    // the tokenizer once per row, where a pre-projection filter on
    // n_words forced a second evaluation of the split in the Filter
    // operator (the explode pitfall's projection-grain sibling); (2) the
    // n_words > 0 gate moves AFTER a narrow materialization barrier
    // (4 longs/row — never the text or the token array), which also
    // stops the total-order sort's range-sampling pass from re-running
    // the whole map side a second time
    totalOrder(load(spark, dir, "documents")
      .withColumn("words", tokens(col("text")))
      .select(col("doc_id"), size(col("words")).cast("long").as("n_words"),
        greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))),
          lit(1)).cast("long").as("n_sentences"),
        graft.functions.GraftFunctions.syllableSum(spark, col("words"))
          .as("n_syllables"))
      .transform(graft.OpCaches.cached)
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        (lit(0.39) * (col("n_words").cast(DoubleType) / col("n_sentences"))
          + lit(11.8) * (col("n_syllables").cast(DoubleType) / col("n_words"))
          - lit(15.59)).as("fk_grade")))

  /** Shannon entropy of the per-document token distribution (bits/token) —
    * the Gopher-style repetition signal: low entropy ⇒ templated or
    * repetitive text wasting its token budget. Pure per-row array
    * expressions, no shuffle: H = −Σ (c/n)·log₂(c/n) over the distinct
    * tokens of the document. Each term is rounded to 6 dp and
    * decimal-accumulated so the fold is associative and engine-stable (the
    * stddev/moving-average convention, here for the one libm call, log2).
    * Per-row cost is O(u·n) in the document's token counts — document-sized
    * rows by construction; a corpus of pathological megadocs would switch
    * to explode + hash-agg (the [[textTokenizeTf]] shape keyed by doc). */
  def textEntropy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val n = size(col("t")).cast(DoubleType)
    // One run-length pass over the SORTED token array instead of the
    // per-distinct-token filter rescan (that form was O(u·n) interpreted
    // lambda evals per document — each of u distinct tokens re-walked all
    // n). Per-token term and 6-dp rounding are unchanged and decimal
    // addition is exact/commutative, so the sum over run-lengths equals
    // the sum over array_distinct order bit-for-bit (oracle hash-green).
    def term(c: org.apache.spark.sql.Column) = {
      val p = c.cast(DoubleType) / n
      round(-p * log2(p), 6).cast(DecimalType(38, 6))
    }
    val runState = struct(lit("").as("tok"), lit(0L).as("run"),
      lit(0).cast(DecimalType(38, 6)).as("acc"))
    val entropy = aggregate(
      array_sort(col("t")),
      runState,
      (s, x) => when(s.getField("run") === 0L,
          struct(x.as("tok"), lit(1L).as("run"),
            s.getField("acc").as("acc")))
        .when(x === s.getField("tok"),
          struct(x.as("tok"), (s.getField("run") + 1L).as("run"),
            s.getField("acc").as("acc")))
        .otherwise(struct(x.as("tok"), lit(1L).as("run"),
          (s.getField("acc") + term(s.getField("run"))).as("acc"))),
      s => (s.getField("acc") + term(s.getField("run"))).cast(DoubleType))
    totalOrder(load(spark, dir, "documents")
      .withColumn("t", tokens(col("text")))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"),
        size(col("t")).as("n_tokens"),
        size(array_distinct(col("t"))).as("n_distinct"),
        entropy.as("entropy_bits"))
      // cache before the total-order sort: the range-sampling pass would
      // otherwise re-run the whole per-row entropy fold a second time
      .transform(graft.OpCaches.cached))
  }

  /** Language ID by stopword-list hits (the n-gram heuristic of SURVEY
    * §2.10): count per-language function-word matches, argmax with a fixed
    * tie order. Emits the guess and agreement with the labeled lang. */
  def textLangId(spark: SparkSession, dir: String): DataFrame = {
    def hits(pat: String) =
      size(regexp_extract_all(lower(col("text")), lit(s"\\b($pat)\\b"), lit(0)))
    totalOrder(load(spark, dir, "documents")
      .withColumn("en_hits", hits("the|and|of|to|a|in|is"))
      .withColumn("es_hits", hits("el|la|de|que|y|en|los"))
      .withColumn("fr_hits", hits("le|la|de|et|les|des|un"))
      .withColumn("de_hits", hits("der|die|und|das|ist|von|den"))
      .withColumn("lang_guess",
        when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("fr_hits")
          && col("en_hits") >= col("de_hits"), "en")
          .when(col("es_hits") >= col("fr_hits") && col("es_hits") >= col("de_hits"), "es")
          .when(col("fr_hits") >= col("de_hits"), "fr")
          .otherwise("de"))
      .select(col("doc_id"), col("lang"), col("en_hits"), col("es_hits"),
        col("fr_hits"), col("de_hits"), col("lang_guess"),
        (col("lang_guess") === col("lang")).as("agree")))
  }

  /** Top-3 sources per language by document count (groupBy + rank top-k
    * per group, SURVEY §2.10 text_lang_topk). */
  def textLangTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_docs").desc, col("source"))
    totalOrder(load(spark, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3))
  }

  /** Document fingerprinting: content hash of the normalized text plus the
    * minimum 8-char-shingle digest (a 1-hash MinHash — the building block
    * the dedup ops expand on). sha256 keeps it engine-portable. */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "documents")
      .withColumn("norm", regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
      .select(col("doc_id"),
        sha2(col("norm"), 256).as("content_hash"),
        array_min(transform(
          sequence(lit(1), greatest(length(col("norm")) - 7, lit(1))),
          i => sha2(col("norm").substr(i, lit(8)), 256)))
          .as("min_shingle_hash"))
      // cache before the total-order sort: the range-sampling pass would
      // otherwise re-run the len(norm) sha256 digests per doc a second time
      .transform(graft.OpCaches.cached))

  // ----------------------------------------------------------------- wiring

  /** A 3-gram this widespread is template text, not content; production
    * sets this near [[Dedup.MaxShingleDf]] (where near-dup discards the
    * vocabulary as non-discriminative) — the fixture corpus tops out at
    * df 7, so the demo threshold sits below that. */
  private val BoilerplateDf = 5

  /** Boilerplate n-gram mining — the other half of the dedup df-cap: a
    * word 3-gram appearing in [[BoilerplateDf]]+ distinct documents is
    * template text (headers, footers, license blocks), exactly the
    * vocabulary the near-dup path treats as noise. Every corpus audit
    * mines this list to build its strip rules. Per-doc distinct shingles
    * (shared plumbing with dedup) → partial-aggregated df per shingle
    * string → high-df survivors with the lowest containing doc as the
    * exemplar. Shuffles only (shingle, doc_id) postings, never documents;
    * at 100 TB the high-df tail is tiny by construction. */
  def textBoilerplate(spark: SparkSession, dir: String): DataFrame =
    totalOrder(Dedup.shingled(spark, dir)
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("first_doc"))
      .filter(col("df") >= BoilerplateDf))

  /** Count floor for the self-trained LM model tables ([[lmScore]] /
    * [[lmBigram]]): a token / bigram pair with corpus count below this
    * collapses into one shared `<unk>` mass instead of carrying its own
    * model row. This BOUNDS the broadcast model at `corpus_mass / floor`
    * rows — the knob a 100 TB deployment turns up (50–100 is typical for
    * web corpora) where an uncapped bigram table is O(distinct pairs) and
    * will not broadcast. The fixture corpora contain hapaxes, so the cap
    * is LIVE in the gated ops and the DuckDB oracle applies the identical
    * floor; [[textLmCapStats]] is the audit twin reporting what the cap
    * kept vs collapsed (the dedup cap-stats idiom). */
  private[graft] val LmCountFloor = 2L

  /** Unigram-LM quality score — the CCNet/KenLM-shaped perplexity filter
    * every pretraining pipeline runs, with the LM trained on the corpus
    * itself: score(doc) = mean over tokens of ln(c(tok)/N), where tokens
    * below [[LmCountFloor]] share the standard `<unk>` probability
    * unk_mass/N (so scoring stays TOTAL — no OOV case — with a bounded
    * model). Very negative ⇒ rare-token-heavy (OCR noise, gibberish);
    * near the corpus mode ⇒ ordinary prose. Two shuffles, both
    * map-side-combined: token counts (keyed by token), then the per-doc
    * mean (keyed by doc_id); the FLOORED vocab joins back BROADCAST
    * (≤ N/floor rows by construction). Each log term is rounded to 6 dp
    * and decimal-accumulated (the [[textEntropy]] convention) so the
    * per-doc fold is associative and engine-stable; the final mean is one
    * IEEE double division (the [[graft.Tables.davg]] shape). */
  def textLmScore(spark: SparkSession, dir: String): DataFrame =
    lmScore(load(spark, dir, "documents"))

  /** (doc_id, token) postings over the cached tokenized frame — the
    * unigram model's input, shared by [[lmScore]] and [[textLmCapStats]]
    * so the audit counts exactly what the scorer counts. */
  private def tokenPostings(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), tokens(col("text")).as("t"))
    .transform(graft.OpCaches.cached)
    .select(col("doc_id"), explode(col("t")).as("token"))

  /** (doc_id, a, b) adjacent-pair postings — the bigram model's input,
    * shared by [[lmBigram]] and [[textLmCapStats]] for the same reason. */
  private def bigramPostings(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), tokens(col("text")).as("t"))
    .transform(graft.OpCaches.cached)
    .filter(size(col("t")) >= 2)
    .select(col("doc_id"), explode(transform(
      sequence(lit(0), size(col("t")) - 2),
      i => struct(element_at(col("t"), i + 1).as("a"),
        element_at(col("t"), i + 2).as("b")))).as("p"))
    .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))

  /** [[textLmScore]] over an arbitrary documents frame (doc_id, text). */
  private[graft] def lmScore(docs: DataFrame,
      floor: Long = LmCountFloor): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val toks = tokenPostings(docs)
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
    // the broadcast model is ONLY tokens at/above the floor; rare tokens
    // miss the left join and fall through to the shared <unk> mass below
    val kept = counts.filter(col("c") >= floor)
    // corpus token total + collapsed rare mass as a one-row frame:
    // broadcast cross join makes them scalars inside the distributed
    // plan, never a collect
    val stats = counts.agg(
      sum(col("c")).cast(DoubleType).as("n"),
      sum(when(col("c") < floor, col("c")).otherwise(lit(0L)))
        .cast(DoubleType).as("unk_c"))
    totalOrder(toks
      .join(broadcast(kept), Seq("token"), "left")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(log(coalesce(col("c").cast(DoubleType), col("unk_c")) / col("n")), 6)
          .cast(DecimalType(38, 6)).as("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("term")).cast(DoubleType) / count(lit(1))).as("avg_logp")))
  }

  /** Bigram-LM fluency score — [[textLmScore]]'s second-order sibling:
    * score(doc) = mean over ADJACENT token pairs of ln p(b|a), with
    * p(b|a) = c₂(a,b) / Σ_b' c₂(a,b') the row-stochastic conditional read
    * off the corpus bigram table itself (self-consistent, so no smoothing
    * term and no OOV case — the model is trained on the scored corpus, the
    * CCNet arrangement). Unigram catches rare WORDS; this catches unlikely
    * SEQUENCES — shuffled or spliced text scores low even when every word
    * is common. Same scale shape as the unigram op: pair postings shuffle
    * by (a,b) for the count, by a for the head total, and the two
    * aggregated model tables broadcast back onto the postings FLOORED at
    * [[LmCountFloor]] — pairs below the floor share one global
    * ln(rare_mass/total) fallback term, so both broadcasts are
    * ≤ mass/floor rows; per-pair terms are 6-dp-rounded and
    * decimal-accumulated. */
  def textLmBigram(spark: SparkSession, dir: String): DataFrame =
    lmBigram(load(spark, dir, "documents"))

  /** [[textLmBigram]] over an arbitrary documents frame (doc_id, text). */
  private[graft] def lmBigram(docs: DataFrame,
      floor: Long = LmCountFloor): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // cached: bi feeds BOTH the model-count shuffle and the final scoring
    // join — without the cache the tokenize + bigram-explode pass runs
    // twice (ReuseExchange can't help; the two consumers shuffle by
    // different keys)
    val bi = bigramPostings(docs).transform(graft.OpCaches.cached)
    val c2 = bi.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c2"))
    val kept2 = c2.filter(col("c2") >= floor)
    // head totals keep the FULL row mass (the conditional's denominator is
    // unchanged by the cap) but only heads surviving in kept2 broadcast —
    // a pair with c2 >= floor implies c1 >= floor, so |c1| <= |kept2|;
    // the semi-join's build side is kept2's distinct heads, also bounded
    val c1 = c2.groupBy(col("a")).agg(sum(col("c2")).as("c1"))
      .join(broadcast(kept2.select(col("a")).distinct()), Seq("a"), "left_semi")
    val stats = c2.agg(
      sum(col("c2")).cast(DoubleType).as("total"),
      sum(when(col("c2") < floor, col("c2")).otherwise(lit(0L)))
        .cast(DoubleType).as("rare_mass"))
    totalOrder(bi
      .join(broadcast(kept2), Seq("a", "b"), "left")
      .join(broadcast(c1), Seq("a"), "left")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(when(col("c2").isNotNull,
            log(col("c2").cast(DoubleType) / col("c1").cast(DoubleType)))
          .otherwise(log(col("rare_mass") / col("total"))), 6)
          .cast(DecimalType(38, 6)).as("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("term")).cast(DoubleType) / count(lit(1))).as("avg_logp2")))
  }

  /** Audit twin of the LM floor (the dedup cap-stats idiom): for each
    * model table, how many types the [[LmCountFloor]] kept vs collapsed
    * and the token mass on each side — the numbers an operator checks
    * BEFORE a corpus-scale LM pass (rare_mass/total is also exactly the
    * `<unk>` probability mass [[lmScore]]/[[lmBigram]] will assign). Two
    * aggregate rows; the heavy work is the same two map-side-combined
    * count shuffles the scoring ops run. */
  def textLmCapStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    val uni = tokenPostings(docs)
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
    val big = bigramPostings(docs)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
    def capRow(model: String, counts: DataFrame): DataFrame = counts
      .agg(
        sum(when(col("c") >= LmCountFloor, 1L).otherwise(0L)).as("kept_types"),
        sum(when(col("c") < LmCountFloor, 1L).otherwise(0L)).as("rare_types"),
        sum(when(col("c") >= LmCountFloor, col("c")).otherwise(0L)).as("kept_mass"),
        sum(when(col("c") < LmCountFloor, col("c")).otherwise(0L)).as("rare_mass"))
      .select(lit(model).as("model"), col("kept_types"), col("rare_types"),
        col("kept_mass"), col("rare_mass"))
    totalOrder(capRow("unigram", uni).unionByName(capRow("bigram", big)))
  }

  /** CCNet-style corpus split: per-language head/middle/tail terciles of
    * the unigram-LM score — the published recipe (CCNet, Wenzek et al.)
    * every pretraining pipeline applies to web text: keep "head" (most
    * fluent third per language), sample "middle", usually drop "tail".
    * Terciles are RANK-exact here — ntile(3) over (score desc, doc_id)
    * per language — because integer rank logic carries a hash oracle
    * where interpolated percentile CUTOFFS would be ulp-fragile at
    * bucket boundaries. The window sorts per language (parallel across
    * languages, range-partitioned within one); at 100 TB the production
    * variant derives cutoffs from a percentile sketch on a sample — the
    * CCNet paper's own arrangement — and buckets by comparison, trading
    * rank-exactness for a sort-free scan; the scoring and per-lang
    * decomposition are identical. */
  def textLmSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    val scored = lmScore(docs).select(col("doc_id"), col("avg_logp"))
    val langs = docs.select(col("doc_id"), col("lang"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("avg_logp").desc, col("doc_id"))
    totalOrder(scored.join(langs, "doc_id")
      .withColumn("t", ntile(3).over(w))
      .select(col("doc_id"), col("lang"), col("avg_logp"),
        when(col("t") === 1, "head").when(col("t") === 2, "middle")
          .otherwise("tail").as("bucket")))
  }

  /** Winnowing window width for [[textWinnowing]]: any shared token run
    * of length ≥ `WinnowW + 3 − 1 = 6` is GUARANTEED to share a selected
    * fingerprint (the Schleimer et al. 2003 coverage bound for window w
    * over k-grams, here 3-token shingles). */
  private[ops] val WinnowW = 4

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
    * the MOSS algorithm): from each sliding window of [[WinnowW]]
    * consecutive shingle hashes, select the RIGHTMOST minimal hash; the
    * distinct (position, hash) selections are the document's
    * fingerprints. Unlike a plain per-doc rolling hash, winnowing has the
    * local-fingerprint GUARANTEE: any match of at least w+k−1 tokens
    * between two documents shares at least one selected fingerprint, and
    * the density is bounded (~2/(w+1)) — which is why every
    * plagiarism/code-dup system builds its index on winnowed prints, not
    * raw shingles. All pure array expressions per row (shingle → md5-
    * derived 32-bit int, the cross-engine hash idiom of
    * pipeline_shuffle_order; window min + rightmost-index fold), so the
    * op is embarrassingly parallel, shuffles nothing but its output, and
    * carries a full DuckDB oracle. At 100 TB the selected prints (a
    * ~2/(w+1) fraction of shingles) are what a dedup index stores. */
  def textWinnowing(spark: SparkSession, dir: String): DataFrame =
    // (round-14 opt note: a pre-sort cache was tried here and measured a
    // wash — the print-grain output is large relative to its compute, so
    // the materialization cost cancels the saved sampling re-run)
    totalOrder(winnowedPrints(load(spark, dir, "documents")))

  /** The winnowed (doc_id, pos, fp) print set of [[textWinnowing]],
    * unsorted — shared with [[Dedup.dedupSubstring]], which localizes
    * cross-document duplicated substrings by exactly these prints (the
    * MOSS index-then-locate arrangement). `pos` is the 1-based token
    * position of the selected 3-token shingle. */
  private[ops] def winnowedPrints(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val sh = transform(
      sequence(lit(0), size(col("t")) - 3),
      i => concat_ws(" ",
        element_at(col("t"), i + 1),
        element_at(col("t"), i + 2),
        element_at(col("t"), i + 3)))
    val hs = transform(col("s"),
      x => graft.functions.GraftFunctions.md5Prefix32(docs.sparkSession, x))
    val sel = transform(
      sequence(lit(0), size(col("h")) - WinnowW),
      w0 => {
        // ONE pass per window, indexing the hash array directly (no slice
        // copies, no separate min scan): fold (fp, idx) over positions
        // 2..w, `<=` so a tie moves the selection RIGHT — exactly the
        // winnowing rightmost-minimum rule
        val first = struct(
          element_at(col("h"), (w0 + 1).cast("int")).as("fp"),
          lit(1).as("idx"))
        val best = aggregate(sequence(lit(2), lit(WinnowW)), first,
          (a, j) => {
            val hj = element_at(col("h"), (w0 + j).cast("int"))
            when(hj <= a.getField("fp"),
              struct(hj.as("fp"), j.as("idx"))).otherwise(a)
          })
        struct((w0 + best.getField("idx")).as("pos"),
          best.getField("fp").as("fp"))
      })
    docs
      .withColumn("t", toks)
      .filter(size(col("t")) >= WinnowW + 2) // >= w windows of 3-shingles
      .withColumn("s", sh)
      .withColumn("h", hs)
      .select(col("doc_id"), explode(sel).as("p"))
      .select(col("doc_id"), col("p.pos").as("pos"), col("p.fp").as("fp"))
      .distinct()
  }

  /** DuckDB CTE chain reconstructing [[winnowedPrints]], ending in
    * `prints` (doc_id, pos, fp) — shared by the text_winnowing oracle and
    * [[Dedup]]'s dedup_substring oracle so the two can never drift. */
  private[ops] val winnowCtes: String =
    s"""tok AS (
       |  SELECT doc_id, list_filter(
       |    regexp_split_to_array(lower(text), '[^a-z0-9'']+'), t -> t <> '') AS t
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, list_transform(
       |    range(1, len(t) - 2 + 1),
       |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS s
       |  FROM tok WHERE len(t) >= $WinnowW + 2),
       |hs AS (
       |  SELECT doc_id, list_transform(s,
       |    x -> CAST(('0x' || substring(md5(x), 1, 8))::UBIGINT AS BIGINT))
       |    AS h
       |  FROM sh),
       |w AS (
       |  SELECT doc_id, h, unnest(range(0, len(h) - $WinnowW + 1)) AS w0
       |  FROM hs),
       |sel AS (
       |  SELECT doc_id,
       |    w0 + list_aggregate(list_transform(range(1, $WinnowW + 1),
       |      j -> CASE WHEN h[w0 + j] =
       |        list_aggregate(h[(w0+1):(w0+$WinnowW)], 'min')
       |        THEN j ELSE 0 END), 'max') AS pos,
       |    list_aggregate(h[(w0+1):(w0+$WinnowW)], 'min') AS fp
       |  FROM w),
       |prints AS (SELECT DISTINCT doc_id, pos, fp FROM sel)""".stripMargin

  /** BM25 query terms / parameters for [[textBm25]] — a fixed demo query
    * with the standard Robertson k1/b constants. */
  private val Bm25Query = Seq("spark", "window", "merge")
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  /** BM25 relevance scoring — the retrieval op of the text family: rank
    * every document against a query term set with the Okapi weighting
    * (idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))) that underlies both
    * search serving and retrieval-based data curation (e.g. mining
    * training docs relevant to a seed query). Shape at 100 TB: ONE corpus
    * pass computes the per-doc term frequencies AS ROW EXPRESSIONS (the
    * query is a handful of terms — no posting-list explode, no shuffle),
    * and the global statistics (N, avgdl, per-term df) are a single
    * one-row aggregate broadcast back — so the whole op is scan + tiny
    * broadcast + scan, embarrassingly parallel. Per-term scores are
    * 6-dp-rounded and decimal-accumulated (the [[textLmScore]]
    * convention); avgdl uses the exact decimal mean. */
  def textBm25(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val docs = load(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .withColumn("dl", size(col("t")).cast(DoubleType))
    val dfCols = Bm25Query.map(t =>
      sum(when(array_contains(col("t"), t), 1L).otherwise(0L)).as(s"df_$t"))
    val stats = docs.agg(
      count(lit(1)).cast(DoubleType).as("n_docs"),
      (davg(col("dl")).as("avgdl") +: dfCols): _*)
    def tf(t: String) = size(filter(col("t"), x => x === t)).cast(DoubleType)
    def idf(t: String) = log(lit(1.0) +
      (col("n_docs") - col(s"df_$t").cast(DoubleType) + lit(0.5)) /
        (col(s"df_$t").cast(DoubleType) + lit(0.5)))
    def term(t: String) =
      when(tf(t) > 0,
        round(idf(t) * tf(t) * lit(Bm25K1 + 1) /
          (tf(t) + lit(Bm25K1) * (lit(1 - Bm25B)
            + lit(Bm25B) * (col("dl") / col("avgdl")))), 6))
        .otherwise(lit(0.0)).cast(DecimalType(38, 6))
    val nMatch = Bm25Query
      .map(t => when(array_contains(col("t"), t), 1).otherwise(0))
      .reduce(_ + _)
    totalOrder(docs.crossJoin(broadcast(stats))
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        nMatch.as("n_terms_matched"),
        Bm25Query.map(term).reduce(_ + _).cast(DoubleType).as("bm25"))
      .filter(col("n_terms_matched") >= 1))
  }

  /** Feature-hash dimensionality for [[textHashingTrick]]. */
  private val HashDims = 64

  /** The hashing trick (Weinberger et al. '09, "Feature Hashing for Large
    * Scale Multitask Learning") — the vocabulary-free featurizer that
    * turns raw text into a FIXED-width sparse count vector with no
    * trained dictionary, no broadcast model, and no second pass: each
    * token maps to dim = md5(token) mod 64 and the doc's vector is the
    * count per dim, emitted sparse as (doc_id, dim, cnt). This is the
    * text→vector bridge of the surface: its output feeds the same
    * cosine/LSH machinery the embedding ops run, but is computable in
    * ONE shuffle-light pass over any corpus (the agg keys on (doc, dim),
    * map-side combined; collisions are the accepted trade and are
    * unbiased at scale). The md5-prefix hash is the repo's cross-engine
    * idiom, so the op is fully oracled. */
  def textHashingTrick(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .withColumn("dim", pmod(
        graft.functions.GraftFunctions.md5Prefix32(spark, col("token")),
        lit(HashDims.toLong)).cast("int"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(count(lit(1)).as("cnt")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_hashing_trick" -> textHashingTrick,
    "text_bm25" -> textBm25,
    "text_lm_score" -> textLmScore,
    "text_lm_bigram" -> textLmBigram,
    "text_lm_cap_stats" -> textLmCapStats,
    "text_lm_split" -> textLmSplit,
    "text_boilerplate" -> textBoilerplate,
    "text_bpe_pairs" -> textBpePairs,
    "text_bpe_encode" -> textBpeEncode,
    "text_tokenize_tf" -> textTokenizeTf,
    "text_token_count" -> textTokenCount,
    "text_quality" -> textQuality,
    "text_readability" -> textReadability,
    "text_entropy" -> textEntropy,
    "text_lang_id" -> textLangId,
    "text_lang_topk" -> textLangTopk,
    "text_fingerprint" -> textFingerprint,
    "text_winnowing" -> textWinnowing)

  /** DuckDB BM25 term score — the exact double expression of
    * [[textBm25]]'s `term`, tf/df names parameterized. Decimal literals
    * promote to DOUBLE on first contact with a double operand (tf, dl,
    * avgdl all double), mirroring the Spark lit constants. */
  private def sqlBm25Term(t: String): String =
    s"""CAST(CASE WHEN tf_$t > 0 THEN round(
       |  ln(1.0 + (n_docs - CAST(df_$t AS DOUBLE) + 0.5)
       |            / (CAST(df_$t AS DOUBLE) + 0.5))
       |  * tf_$t * 2.2
       |  / (tf_$t + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))), 6)
       |ELSE 0.0 END AS DECIMAL(38,6))""".stripMargin

  val oracle: Map[String, String] = Map(
    "text_hashing_trick" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_filter(
         |    regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
         |    x -> x <> '')) AS token
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(CAST(('0x' || substring(md5(token), 1, 8))::UBIGINT AS BIGINT)
         |    % $HashDims AS INTEGER) AS dim,
         |  COUNT(*) AS cnt
         |FROM toks GROUP BY 1, 2
         |${orderAll("doc_id", "dim", "cnt")}""".stripMargin,
    "text_bm25" ->
      s"""WITH tok AS (
         |  SELECT doc_id, list_filter(
         |    regexp_split_to_array(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS t
         |  FROM documents),
         |st AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         |    ${graft.Tables.sqlDavg("len(t)")} AS avgdl,
         |    ${Bm25Query.map(t =>
              s"SUM(CASE WHEN list_contains(t, '$t') THEN 1 ELSE 0 END) AS df_$t")
              .mkString(",\n    ")}
         |  FROM tok),
         |tfs AS (
         |  SELECT doc_id, len(t) AS dl,
         |    ${Bm25Query.map(t =>
              s"CAST(len(list_filter(t, x -> x = '$t')) AS DOUBLE) AS tf_$t")
              .mkString(",\n    ")}
         |  FROM tok)
         |SELECT doc_id, dl,
         |  ${Bm25Query.map(t => s"(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END)")
              .mkString(" + ")} AS n_terms_matched,
         |  CAST(${Bm25Query.map(sqlBm25Term).mkString("\n  + ")}
         |    AS DOUBLE) AS bm25
         |FROM tfs CROSS JOIN st
         |WHERE ${Bm25Query.map(t => s"(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END)")
              .mkString(" + ")} >= 1
         |${orderAll("doc_id", "dl", "n_terms_matched", "bm25")}""".stripMargin,
    "text_lm_score" ->
      s"""WITH toks AS (
         |  SELECT doc_id, token
         |  FROM (SELECT doc_id,
         |          unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+'))
         |            AS token
         |        FROM documents)
         |  WHERE token <> ''),
         |counts AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
         |kept AS (SELECT token, c FROM counts WHERE c >= $LmCountFloor),
         |st AS (SELECT CAST(SUM(c) AS DOUBLE) AS n,
         |  CAST(SUM(CASE WHEN c < $LmCountFloor THEN c ELSE 0 END) AS DOUBLE)
         |    AS unk_c FROM counts)
         |SELECT doc_id, COUNT(*) AS n_tokens,
         |  CAST(SUM(CAST(round(ln(COALESCE(CAST(c AS DOUBLE), unk_c) / n), 6)
         |    AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_logp
         |FROM toks LEFT JOIN kept USING (token) CROSS JOIN st
         |GROUP BY doc_id
         |${orderAll("doc_id", "n_tokens", "avg_logp")}""".stripMargin,
    "text_lm_bigram" ->
      s"""WITH tok AS (
         |  SELECT doc_id, list_filter(
         |    regexp_split_to_array(lower(text), '[^a-z0-9'']+'), t -> t <> '') AS t
         |  FROM documents),
         |bi AS (
         |  SELECT doc_id, p.a AS a, p.b AS b
         |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(t)),
         |          i -> struct_pack(a := t[i], b := t[i + 1]))) AS p
         |        FROM tok WHERE len(t) >= 2)),
         |c2 AS (SELECT a, b, COUNT(*) AS c2 FROM bi GROUP BY a, b),
         |kept2 AS (SELECT a, b, c2 FROM c2 WHERE c2 >= $LmCountFloor),
         |c1 AS (SELECT a, SUM(c2) AS c1 FROM c2 GROUP BY a),
         |st AS (SELECT CAST(SUM(c2) AS DOUBLE) AS total,
         |  CAST(SUM(CASE WHEN c2 < $LmCountFloor THEN c2 ELSE 0 END) AS DOUBLE)
         |    AS rare_mass FROM c2)
         |SELECT doc_id, COUNT(*) AS n_bigrams,
         |  CAST(SUM(CAST(round(CASE WHEN kept2.c2 IS NOT NULL
         |    THEN ln(CAST(kept2.c2 AS DOUBLE) / CAST(c1 AS DOUBLE))
         |    ELSE ln(rare_mass / total) END, 6)
         |    AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_logp2
         |FROM bi LEFT JOIN kept2 USING (a, b) LEFT JOIN c1 USING (a)
         |  CROSS JOIN st
         |GROUP BY doc_id
         |${orderAll("doc_id", "n_bigrams", "avg_logp2")}""".stripMargin,
    "text_winnowing" ->
      s"""WITH $winnowCtes
         |SELECT doc_id, pos, fp FROM prints
         |${orderAll("doc_id", "pos", "fp")}""".stripMargin,
    "text_lm_split" ->
      s"""WITH toks AS (
         |  SELECT doc_id, token
         |  FROM (SELECT doc_id,
         |          unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+'))
         |            AS token
         |        FROM documents)
         |  WHERE token <> ''),
         |counts AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
         |kept AS (SELECT token, c FROM counts WHERE c >= $LmCountFloor),
         |st AS (SELECT CAST(SUM(c) AS DOUBLE) AS n,
         |  CAST(SUM(CASE WHEN c < $LmCountFloor THEN c ELSE 0 END) AS DOUBLE)
         |    AS unk_c FROM counts),
         |sc AS (
         |  SELECT doc_id,
         |    CAST(SUM(CAST(round(ln(COALESCE(CAST(c AS DOUBLE), unk_c) / n), 6)
         |      AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_logp
         |  FROM toks LEFT JOIN kept USING (token) CROSS JOIN st
         |  GROUP BY doc_id)
         |SELECT doc_id, lang, avg_logp,
         |  CASE ntile(3) OVER (PARTITION BY lang
         |      ORDER BY avg_logp DESC, doc_id)
         |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
         |  END AS bucket
         |FROM sc JOIN documents USING (doc_id)
         |${orderAll("doc_id", "lang", "avg_logp", "bucket")}""".stripMargin,
    "text_lm_cap_stats" ->
      s"""WITH toks AS (
         |  SELECT doc_id, token
         |  FROM (SELECT doc_id,
         |          unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+'))
         |            AS token
         |        FROM documents)
         |  WHERE token <> ''),
         |counts AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
         |tok AS (
         |  SELECT doc_id, list_filter(
         |    regexp_split_to_array(lower(text), '[^a-z0-9'']+'), t -> t <> '') AS t
         |  FROM documents),
         |c2 AS (
         |  SELECT p.a AS a, p.b AS b, COUNT(*) AS c FROM (
         |    SELECT unnest(list_transform(range(1, len(t)),
         |      i -> struct_pack(a := t[i], b := t[i + 1]))) AS p
         |    FROM tok WHERE len(t) >= 2)
         |  GROUP BY 1, 2),
         |u AS (SELECT 'unigram' AS model,
         |  CAST(SUM(CASE WHEN c >= $LmCountFloor THEN 1 ELSE 0 END) AS BIGINT)
         |    AS kept_types,
         |  CAST(SUM(CASE WHEN c < $LmCountFloor THEN 1 ELSE 0 END) AS BIGINT)
         |    AS rare_types,
         |  CAST(SUM(CASE WHEN c >= $LmCountFloor THEN c ELSE 0 END) AS BIGINT)
         |    AS kept_mass,
         |  CAST(SUM(CASE WHEN c < $LmCountFloor THEN c ELSE 0 END) AS BIGINT)
         |    AS rare_mass FROM counts),
         |b AS (SELECT 'bigram' AS model,
         |  CAST(SUM(CASE WHEN c >= $LmCountFloor THEN 1 ELSE 0 END) AS BIGINT)
         |    AS kept_types,
         |  CAST(SUM(CASE WHEN c < $LmCountFloor THEN 1 ELSE 0 END) AS BIGINT)
         |    AS rare_types,
         |  CAST(SUM(CASE WHEN c >= $LmCountFloor THEN c ELSE 0 END) AS BIGINT)
         |    AS kept_mass,
         |  CAST(SUM(CASE WHEN c < $LmCountFloor THEN c ELSE 0 END) AS BIGINT)
         |    AS rare_mass FROM c2)
         |SELECT * FROM (SELECT * FROM u UNION ALL SELECT * FROM b)
         |${orderAll("model", "kept_types", "rare_types", "kept_mass",
              "rare_mass")}""".stripMargin,
    "text_boilerplate" ->
      s"""WITH tok AS (
         |  SELECT doc_id, list_filter(
         |    regexp_split_to_array(lower(text), '[^a-z0-9'']+'), t -> t <> '') AS t
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    range(1, greatest(len(t) - 2, 1) + 1),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
         |  FROM tok WHERE len(t) >= 3)
         |SELECT s, df, first_doc FROM (
         |  SELECT sh AS s, COUNT(*) AS df, MIN(doc_id) AS first_doc
         |  FROM (SELECT doc_id, unnest(s) AS sh FROM sh)
         |  GROUP BY sh)
         |WHERE df >= 5
         |${orderAll("s", "df", "first_doc")}""".stripMargin,
    "text_bpe_pairs" ->
      s"""WITH tok AS (
         |  SELECT doc_id, list_filter(
         |    regexp_split_to_array(lower(text), '[^a-z0-9'']+'), t -> t <> '') AS t
         |  FROM documents),
         |pairs AS (
         |  SELECT unnest(list_transform(range(1, len(t)),
         |    i -> struct_pack(a := t[i], b := t[i + 1]))) AS p
         |  FROM tok WHERE len(t) >= 2)
         |SELECT p.a AS left_tok, p.b AS right_tok, COUNT(*) AS pair_count
         |FROM pairs GROUP BY 1, 2
         |HAVING COUNT(*) >= 5
         |${orderAll("left_tok", "right_tok", "pair_count")}""".stripMargin,
    "text_bpe_encode" ->
      // the same double-space fold as the Spark op: list_reduce has no
      // init parameter, so the doc string is PREPENDED to the (VARCHAR-
      // encoded "a b") merge list — the accumulator stays a plain VARCHAR
      // throughout (the LIST-in-struct list_reduce bug doesn't apply)
      s"""WITH tok AS (
         |  SELECT doc_id, list_filter(
         |    regexp_split_to_array(lower(text), '[^a-z0-9'']+'), t -> t <> '') AS t
         |  FROM documents),
         |pr AS (
         |  SELECT p.a AS a, p.b AS b, COUNT(*) AS c FROM (
         |    SELECT unnest(list_transform(range(1, len(t)),
         |      i -> struct_pack(a := t[i], b := t[i + 1]))) AS p
         |    FROM tok WHERE len(t) >= 2)
         |  GROUP BY 1, 2),
         |mg AS (
         |  SELECT list(a || ' ' || b ORDER BY c DESC, a, b)[1:32] AS merges
         |  FROM pr),
         |enc AS (
         |  SELECT doc_id, len(t) AS n_ws,
         |    list_reduce(list_prepend(
         |        ' ' || list_aggregate(t, 'string_agg', '  ') || ' ', merges),
         |      (acc, m) -> replace(acc,
         |        ' ' || split_part(m, ' ', 1) || '  ' || split_part(m, ' ', 2) || ' ',
         |        ' ' || split_part(m, ' ', 1) || '_' || split_part(m, ' ', 2) || ' '))
         |      AS e
         |  FROM tok CROSS JOIN mg WHERE len(t) > 0)
         |SELECT doc_id, n_ws AS n_ws_tokens,
         |  len(str_split(trim(e), '  ')) AS n_bpe_tokens,
         |  n_ws - len(str_split(trim(e), '  ')) AS n_merged
         |FROM enc
         |UNION ALL
         |SELECT doc_id, 0, 0, 0 FROM tok WHERE len(t) = 0
         |${orderAll("doc_id", "n_ws_tokens", "n_bpe_tokens", "n_merged")}""".stripMargin,
    "text_tokenize_tf" ->
      s"""SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
         |FROM (SELECT doc_id,
         |        unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+')) AS token
         |      FROM documents)
         |WHERE token <> '' GROUP BY token
         |${orderAll("token", "tf", "df")}""".stripMargin,
    "text_token_count" ->
      s"""SELECT doc_id, n_chars,
         |  len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
         |      t -> t <> '')) AS n_ws_tokens,
         |  len(regexp_extract_all(lower(text),
         |      '''(?:s|d|m|t|ll|ve|re)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s'']+'))
         |    AS n_bpe_tokens
         |FROM documents
         |${orderAll("doc_id", "n_chars", "n_ws_tokens", "n_bpe_tokens")}""".stripMargin,
    "text_readability" ->
      s"""WITH tok AS (
         |  SELECT doc_id, text, list_filter(
         |    regexp_split_to_array(lower(text), '[^a-z0-9'']+'), x -> x <> '')
         |    AS words
         |  FROM documents),
         |n AS (
         |  SELECT doc_id,
         |    CAST(len(words) AS BIGINT) AS n_words,
         |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
         |      AS BIGINT) AS n_sentences,
         |    CAST(list_sum(list_transform(words,
         |      w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1)))
         |      AS BIGINT) AS n_syllables
         |  FROM tok WHERE len(words) > 0)
         |SELECT doc_id, n_words, n_sentences, n_syllables,
         |  0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
         |    + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
         |    - 15.59 AS fk_grade
         |FROM n
         |${orderAll("doc_id", "n_words", "n_sentences", "n_syllables",
             "fk_grade")}""".stripMargin,
    "text_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id, n_chars,
         |    CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
         |        x -> x <> '')) AS DOUBLE) AS n_tokens,
         |    CAST(len(regexp_extract_all(lower(text),
         |        '\\b(the|a|and|of|to|in|is|for|on|it)\\b')) AS DOUBLE) AS n_stop,
         |    CAST(len(regexp_extract_all(text, '[^a-z0-9\\s'']')) AS DOUBLE) AS n_punct
         |  FROM documents)
         |SELECT doc_id, n_chars, n_tokens,
         |  n_stop / n_tokens AS stop_ratio,
         |  n_punct / n_chars AS punct_ratio,
         |  n_chars / n_tokens AS chars_per_token,
         |  (n_stop / n_tokens) * 0.5 - (n_punct / n_chars) * 0.3
         |    + (CASE WHEN n_tokens >= 20.0 THEN 0.2 ELSE 0.0 END) AS quality
         |FROM t
         |${orderAll("doc_id", "n_chars", "n_tokens", "stop_ratio")}""".stripMargin,
    "text_entropy" ->
      s"""WITH tok AS (
         |  SELECT doc_id, list_filter(
         |    regexp_split_to_array(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS t
         |  FROM documents),
         |x AS (
         |  SELECT doc_id, len(t) AS n, unnest(t) AS tk
         |  FROM tok WHERE len(t) > 0),
         |c AS (
         |  SELECT doc_id, n, tk, COUNT(*) AS cnt FROM x GROUP BY doc_id, n, tk)
         |SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
         |  CAST(COUNT(*) AS INTEGER) AS n_distinct,
         |  CAST(SUM(CAST(round(-(cnt / CAST(n AS DOUBLE))
         |      * log2(cnt / CAST(n AS DOUBLE)), 6) AS DECIMAL(38, 6)))
         |    AS DOUBLE) AS entropy_bits
         |FROM c GROUP BY doc_id, n
         |${orderAll("doc_id", "n_tokens", "n_distinct", "entropy_bits")}""".stripMargin,
    "text_lang_id" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang,
         |    len(regexp_extract_all(lower(text), '\\b(the|and|of|to|a|in|is)\\b')) AS en_hits,
         |    len(regexp_extract_all(lower(text), '\\b(el|la|de|que|y|en|los)\\b')) AS es_hits,
         |    len(regexp_extract_all(lower(text), '\\b(le|la|de|et|les|des|un)\\b')) AS fr_hits,
         |    len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist|von|den)\\b')) AS de_hits
         |  FROM documents)
         |SELECT doc_id, lang, en_hits, es_hits, fr_hits, de_hits,
         |  CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits THEN 'en'
         |       WHEN es_hits >= fr_hits AND es_hits >= de_hits THEN 'es'
         |       WHEN fr_hits >= de_hits THEN 'fr' ELSE 'de' END AS lang_guess,
         |  (CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits THEN 'en'
         |       WHEN es_hits >= fr_hits AND es_hits >= de_hits THEN 'es'
         |       WHEN fr_hits >= de_hits THEN 'fr' ELSE 'de' END) = lang AS agree
         |FROM h
         |${orderAll("doc_id", "lang", "lang_guess", "agree")}""".stripMargin,
    "text_lang_topk" ->
      s"""SELECT lang, source, n_docs, rk FROM (
         |  SELECT lang, source, COUNT(*) AS n_docs,
         |    ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY COUNT(*) DESC, source) AS rk
         |  FROM documents GROUP BY lang, source)
         |WHERE rk <= 3
         |${orderAll("lang", "source", "n_docs", "rk")}""".stripMargin,
    "text_fingerprint" ->
      s"""WITH n AS (
         |  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS norm
         |  FROM documents)
         |SELECT doc_id, sha256(norm) AS content_hash,
         |  list_min(list_transform(range(1, greatest(len(norm) - 7, 1) + 1),
         |    i -> sha256(substr(norm, i, 8)))) AS min_shingle_hash
         |FROM n
         |${orderAll("doc_id", "content_hash", "min_shingle_hash")}""".stripMargin)
}
