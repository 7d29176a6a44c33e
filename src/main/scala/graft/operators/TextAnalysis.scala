package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Prefix, Tables}
import graft.functions.TextFunctions._

/** Text analysis for a training-data pipeline (SURVEY.md §2.D): language
  * ID, quality scoring, token counting, document fingerprinting — all
  * over the `documents` table, all pure Column expressions (codegen'd,
  * embarrassingly parallel: no shuffle except the final small
  * aggregation where one exists).
  */
object TextAnalysis {

  private val enMarkers = Seq("the", "a", "of", "and", "to", "is")
  private val esMarkers = Seq("el", "la", "de", "y", "que", "en")
  private val deMarkers = Seq("der", "die", "das", "und", "ist", "zu")

  private def markersSql(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ",", ")")

  /** text_langid — stopword-marker language ID (n-gram heuristic): score
    * each language by marker-word hits, argmax with 'und' (undetermined)
    * fallback. Output is the confusion matrix against the metadata lang
    * label. */
  def textLangid(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // one kernel pass probes all three marker sets (the HOF form
      // re-split the text and ran an interpreted filter per language)
      .select(col("doc_id"), col("lang"),
        markerHitsMulti(words(col("text")),
          Seq(enMarkers, esMarkers, deMarkers)).as("h"))
      .select(col("doc_id"), col("lang"),
        col("h").getItem(0).as("en_hits"),
        col("h").getItem(1).as("es_hits"),
        col("h").getItem(2).as("de_hits"))
      .withColumn("pred_lang",
        when(col("en_hits") > col("es_hits") && col("en_hits") > col("de_hits"), "en")
          .when(col("es_hits") > col("en_hits") && col("es_hits") > col("de_hits"), "es")
          .when(col("de_hits") > col("en_hits") && col("de_hits") > col("es_hits"), "de")
          .otherwise("und"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("en_hits")).as("total_en_hits"))
      .orderBy(col("lang"), col("pred_lang"))

  val textLangidSql: String = {
    val w = wordsSql("text")
    def hits(m: Seq[String]) = s"len(list_filter($w, x -> x IN ${markersSql(m)}))"
    s"""WITH scored AS (
      |  SELECT doc_id, lang,
      |    ${hits(enMarkers)} AS en_hits,
      |    ${hits(esMarkers)} AS es_hits,
      |    ${hits(deMarkers)} AS de_hits
      |  FROM documents
      |), pred AS (
      |  SELECT lang, en_hits,
      |    CASE WHEN en_hits > es_hits AND en_hits > de_hits THEN 'en'
      |         WHEN es_hits > en_hits AND es_hits > de_hits THEN 'es'
      |         WHEN de_hits > en_hits AND de_hits > es_hits THEN 'de'
      |         ELSE 'und' END AS pred_lang
      |  FROM scored
      |)
      |SELECT lang, pred_lang, COUNT(*) AS n_docs, CAST(SUM(en_hits) AS BIGINT) AS total_en_hits
      |FROM pred GROUP BY lang, pred_lang
      |ORDER BY lang, pred_lang""".stripMargin
  }

  /** text_quality — per-document quality metrics: length, word count,
    * average word length, stopword ratio, and a CASE quality class
    * (filtering rule of a pretraining pipeline). Ratios are single IEEE
    * divisions of integers — bit-identical across engines. */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val ws = words(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        length(col("text")).as("n_chars_raw"),
        size(ws).as("n_words"),
        markerHits(col("text"), enMarkers).as("stop_hits"))
      .withColumn("avg_word_len",
        (col("n_chars_raw") - (col("n_words") - 1)).cast("double") / col("n_words"))
      .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_words"))
      .withColumn("quality_class",
        when(col("n_words") < 40, "TOO_SHORT")
          .when(col("stop_ratio") > 0.12, "BOILERPLATE")
          .otherwise("OK"))
      .orderBy(col("doc_id"))
  }

  val textQualitySql: String = {
    val w = wordsSql("text")
    s"""SELECT doc_id,
      |  length(text) AS n_chars_raw,
      |  len($w) AS n_words,
      |  len(list_filter($w, x -> x IN ${markersSql(enMarkers)})) AS stop_hits,
      |  CAST(length(text) - (len($w) - 1) AS DOUBLE) / len($w) AS avg_word_len,
      |  CAST(len(list_filter($w, x -> x IN ${markersSql(enMarkers)})) AS DOUBLE) / len($w) AS stop_ratio,
      |  CASE WHEN len($w) < 40 THEN 'TOO_SHORT'
      |       WHEN CAST(len(list_filter($w, x -> x IN ${markersSql(enMarkers)})) AS DOUBLE) / len($w) > 0.12 THEN 'BOILERPLATE'
      |       ELSE 'OK' END AS quality_class
      |FROM documents
      |ORDER BY doc_id""".stripMargin
  }

  /** text_tokens — token counting per source: whitespace tokens and a
    * BPE-ish regex tokenization (alnum runs + punctuation marks). */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        size(words(col("text"))).as("ws_tokens"),
        regexTokenCount(col("text")).as("re_tokens"),
        length(col("text")).as("n_chars_raw"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).as("total_ws_tokens"),
        sum(col("re_tokens")).as("total_re_tokens"),
        sum(col("n_chars_raw")).as("total_chars"))
      .orderBy(col("source"))

  val textTokensSql: String =
    s"""SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(len(${wordsSql("text")})) AS BIGINT) AS total_ws_tokens,
      |  CAST(SUM(${regexTokenCountSql("text")}) AS BIGINT) AS total_re_tokens,
      |  CAST(SUM(length(text)) AS BIGINT) AS total_chars
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** text_fingerprint — per-document fingerprints: md5 of normalized text
    * (exact-dedup key) and a polynomial rolling hash (cheap shift-
    * resistant fingerprint; the minhash family builds on the same idea). */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(normText(col("text")).cast("binary")).as("fp_md5"),
        rollingHash(col("text")).as("fp_roll"))
      .withColumn("fp_prefix", substring(col("fp_md5"), 1, 8))
      .orderBy(col("doc_id"))

  val textFingerprintSql: String =
    s"""SELECT doc_id,
      |  md5(${normTextSql("text")}) AS fp_md5,
      |  ${rollingHashSql("text")} AS fp_roll,
      |  substr(md5(${normTextSql("text")}), 1, 8) AS fp_prefix
      |FROM documents ORDER BY doc_id""".stripMargin

  /** text_clean — normalization/scrubbing pass of a pretraining pipeline:
    * strip URLs and e-mail addresses, lowercase, collapse whitespace.
    * Emits per-doc before/after lengths and the cleaned-text fingerprint
    * (the exact-dedup key of the CLEANED corpus — scrub-then-dedup is the
    * standard order, since boilerplate URLs differ across mirror copies).
    * Pure per-row string expressions: embarrassingly parallel, no
    * shuffle except the presentation sort. */
  def textClean(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("clean",
        trim(regexp_replace(
          regexp_replace(
            regexp_replace(lower(col("text")), "https?://\\S+", " "),
            "\\S+@\\S+", " "),
          "\\s+", " ")))
      .select(col("doc_id"),
        length(col("text")).as("raw_len"),
        length(col("clean")).as("clean_len"),
        md5(col("clean").cast("binary")).as("clean_fp"))
      .orderBy(col("doc_id"))

  val textCleanSql: String =
    """SELECT doc_id,
      |  length(text) AS raw_len,
      |  length(trim(regexp_replace(
      |    regexp_replace(
      |      regexp_replace(lower(text), 'https?://\S+', ' ', 'g'),
      |      '\S+@\S+', ' ', 'g'),
      |    '\s+', ' ', 'g'))) AS clean_len,
      |  md5(trim(regexp_replace(
      |    regexp_replace(
      |      regexp_replace(lower(text), 'https?://\S+', ' ', 'g'),
      |      '\S+@\S+', ' ', 'g'),
      |    '\s+', ' ', 'g'))) AS clean_fp
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** sample_stratified — deterministic stratified corpus sampling: k docs
    * per source stratum, ordered by the md5 of the doc id (a seeded,
    * engine-portable stand-in for a random draw — `rand()` would break
    * the oracle). The per-stratum rank is a window over the stratum
    * partition: one shuffle on source, top-k retained. This is the
    * corpus-subsampling step of a training-mix pipeline (fixed quota per
    * source, reproducible across runs and engines). */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val k = 20
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .orderBy(col("source"), col("rk"))
  }

  val sampleStratifiedSql: String =
    """SELECT doc_id, source, lang, rk FROM (
      |  SELECT doc_id, source, lang,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 20
      |ORDER BY source, rk""".stripMargin

  /** sample_hash_split — deterministic train/val/test split: bucket =
    * affine hash of the doc id mod 100, train < 80 ≤ val < 90 ≤ test.
    * The split is a pure per-row expression — reproducible across runs,
    * engines, and table layouts, and any future doc lands in a stable
    * split (the property that matters when the corpus grows to 100 TB:
    * re-splitting must never migrate training docs into the test set).
    * Output is the per-(split, source) contingency with an exact id
    * checksum so the oracle verifies the MEMBERSHIP, not just counts. */
  def sampleHashSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("bucket", pmod(col("doc_id") * 2654435761L, lit(1000000007L)) % 100L)
      .withColumn("split",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val").otherwise("test"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_checksum"))
      .orderBy(col("split"), col("source"))

  val sampleHashSplitSql: String =
    """WITH b AS (
      |  SELECT doc_id, source, (doc_id * 2654435761 % 1000000007) % 100 AS bucket
      |  FROM documents
      |)
      |SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
      |  source, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_checksum
      |FROM b GROUP BY 1, 2
      |ORDER BY split, source""".stripMargin

  /** text_ngram_topk — corpus n-gram statistics: top-k bigrams per
    * language (count all occurrences, deterministic tie-break on the
    * bigram itself). The corpus-frequency step of stopword/boilerplate
    * mining. Scale: explode → one shuffle on (lang, bigram) with map-side
    * combine; the top-k window runs on the already-aggregated (small)
    * count table, and rank-k output is bounded. The words array is
    * materialized before the zip_with lambda (HOF no-CSE discipline). */
  def textNgramTopk(spark: SparkSession, dir: String): DataFrame = {
    val k = 5
    // bigram fan-out is one native kernel call per doc (WordBigrams, in
    // whole-stage codegen) — the zip_with-over-slices HOF form evaluated
    // interpreted, one lambda dispatch per element; arrays shorter than
    // 2 words yield an empty array, which explode drops (the old
    // size >= 2 guard)
    val bigrams = Tables.documents(spark, dir)
      .select(col("lang"),
        explode(org.apache.spark.sql.graftvec.NgramExpressions
          .wordBigrams(words(col("text")))).as("bigram"))
    val counts = bigrams.groupBy(col("lang"), col("bigram")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("bigram"))
    counts.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("lang"), col("rnk"), col("bigram"), col("n"))
      .orderBy(col("lang"), col("rnk"))
  }

  val textNgramTopkSql: String =
    s"""WITH toks AS (
      |  SELECT lang, ${wordsSql("text")} AS ws FROM documents
      |), bg AS (
      |  SELECT lang,
      |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bigram
      |  FROM toks WHERE len(ws) >= 2
      |), counts AS (
      |  SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY 1, 2
      |), ranked AS (
      |  SELECT lang, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rnk,
      |    bigram, n
      |  FROM counts
      |)
      |SELECT lang, rnk, bigram, n FROM ranked
      |WHERE rnk <= 5
      |ORDER BY lang, rnk""".stripMargin

  /** text_repetition — Gopher-style repetition metrics per document, the
    * "dull generated/looping text" filter of a pretraining pipeline:
    * distinct-word ratio and the most-frequent-bigram fraction, with a
    * CASE repetition class (REPETITIVE on low vocabulary diversity,
    * LOOPY when one bigram dominates). Per-doc bigram counting is one
    * explode + two map-side-combining aggregations; ratios are single
    * IEEE divisions of integers, so both engines compute identical
    * doubles. Docs under 2 words have no bigram and are excluded
    * (matching the oracle's len(ws) >= 2). */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    // every metric is row-local: the top-bigram count runs as one native
    // kernel (graftvec.TopBigramCount) instead of explode-bigrams → two
    // corpus-wide shuffles — the whole operator is map-only + final sort
    Tables.documents(spark, dir)
      .withColumn("ws", words(col("text")))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        size(col("ws")).as("n_words"),
        size(array_distinct(col("ws"))).as("n_distinct"),
        org.apache.spark.sql.graftvec.MinHashExpressions
          .topBigramCount(col("ws")).as("top_bigram_n"))
      .withColumn("distinct_ratio", col("n_distinct").cast("double") / col("n_words"))
      .withColumn("top_bigram_frac",
        col("top_bigram_n").cast("double") / (col("n_words") - 1))
      .withColumn("rep_class",
        when(col("distinct_ratio") < 0.5, "REPETITIVE")
          .when(col("top_bigram_frac") > 0.1, "LOOPY")
          .otherwise("OK"))
      .orderBy(col("doc_id"))
  }

  val textRepetitionSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, ${wordsSql("text")} AS ws FROM documents
      |), base AS (
      |  SELECT doc_id, len(ws) AS n_words, len(list_distinct(ws)) AS n_distinct,
      |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bigram
      |  FROM toks WHERE len(ws) >= 2
      |), bc AS (
      |  SELECT doc_id, n_words, n_distinct, bigram, COUNT(*) AS bn
      |  FROM base GROUP BY 1, 2, 3, 4
      |), top AS (
      |  SELECT doc_id, n_words, n_distinct, MAX(bn) AS top_bigram_n
      |  FROM bc GROUP BY 1, 2, 3
      |)
      |SELECT doc_id, n_words, n_distinct, top_bigram_n,
      |  CAST(n_distinct AS DOUBLE) / n_words AS distinct_ratio,
      |  CAST(top_bigram_n AS DOUBLE) / (n_words - 1) AS top_bigram_frac,
      |  CASE WHEN CAST(n_distinct AS DOUBLE) / n_words < 0.5 THEN 'REPETITIVE'
      |       WHEN CAST(top_bigram_n AS DOUBLE) / (n_words - 1) > 0.1 THEN 'LOOPY'
      |       ELSE 'OK' END AS rep_class
      |FROM top
      |ORDER BY doc_id""".stripMargin

  /** sample_weighted — deterministic domain-mixture sampling: each source
    * gets a target keep-rate (the training-mix weight — src{N} keeps
    * (N mod 4 + 1)/4 of its docs here), and a doc survives iff its affine
    * id hash lands under the source's threshold. The per-row decision is
    * pure arithmetic: reproducible across runs/engines/layouts, stable
    * under corpus growth (a new doc never flips an old doc's membership),
    * and embarrassingly parallel — the mix step of a 100 TB pipeline is
    * a filter at scan speed, no shuffle until the audit aggregate.
    * Output is the per-source audit: kept counts vs quota and an exact
    * id checksum of the kept set (membership, not just counts). */
  def sampleWeighted(spark: SparkSession, dir: String): DataFrame = {
    val srcN = regexp_extract(col("source"), "src(\\d+)", 1).cast("long")
    val threshold = (srcN % 4L + 1L) * 250L // of 1000
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("thr", threshold)
      .withColumn("kept", pmod(col("doc_id") * 2654435761L, lit(1000000007L)) % 1000L < col("thr"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        max(col("thr")).as("keep_per_mille"),
        sum(when(col("kept"), col("doc_id"))).as("kept_id_checksum"))
      .orderBy(col("source"))
  }

  val sampleWeightedSql: String =
    """WITH b AS (
      |  SELECT doc_id, source,
      |    (CAST(regexp_extract(source, 'src(\d+)', 1) AS BIGINT) % 4 + 1) * 250 AS thr,
      |    (doc_id * 2654435761 % 1000000007) % 1000 AS bucket
      |  FROM documents
      |)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN bucket < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  MAX(thr) AS keep_per_mille,
      |  CAST(SUM(CASE WHEN bucket < thr THEN doc_id END) AS BIGINT) AS kept_id_checksum
      |FROM b GROUP BY source
      |ORDER BY source""".stripMargin

  /** pipeline_manifest — the end-to-end training-data pipeline as one
    * composed query: scrub (lowercase + URL/e-mail strip + whitespace
    * collapse) → quality gate (n_words ≥ 40, stopword ratio ≤ 0.12) →
    * exact dedup on the CLEANED text (min doc_id per fingerprint
    * survives) → deterministic per-source sample quota (10, ordered by
    * md5 of the id). Emits the per-source funnel: how many docs entered,
    * passed quality, survived dedup, and were sampled — plus the sampled
    * ids. Every stage is a Column expression or one window; the funnel
    * aggregate is the only row-reducing shuffle. */
  def pipelineManifest(spark: SparkSession, dir: String): DataFrame = {
    val ws = words(col("text"))
    val clean = trim(regexp_replace(
      regexp_replace(
        regexp_replace(lower(col("text")), "https?://\\S+", " "),
        "\\S+@\\S+", " "),
      "\\s+", " "))
    val wFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    // quota ranks WITHIN the kept set (partition on the kept flag too),
    // so every source yields min(quota, n_kept) samples
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("kept"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val staged = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(ws).as("n_words"),
        markerHits(col("text"), enMarkers).as("stop_hits"),
        md5(clean.cast("binary")).as("fp"))
      .withColumn("quality_ok",
        col("n_words") >= 40 &&
          col("stop_hits").cast("double") / col("n_words") <= 0.12)
      .withColumn("is_canonical", col("doc_id") === min(col("doc_id")).over(wFp))
      .withColumn("kept", col("quality_ok") && col("is_canonical"))
      .withColumn("rk", row_number().over(wSrc))
      .withColumn("sampled", col("kept") && col("rk") <= SampleQuota)
    staged.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("quality_ok"), 1L).otherwise(0L)).as("n_quality_ok"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"),
        array_join(
          transform(array_sort(collect_list(when(col("sampled"), col("doc_id")))),
            _.cast("string")), ",").as("sample_ids"))
      .orderBy(col("source"))
  }

  val SampleQuota = 10

  val pipelineManifestSql: String = {
    val w = wordsSql("text")
    val cleanSql =
      """trim(regexp_replace(
        |    regexp_replace(
        |      regexp_replace(lower(text), 'https?://\S+', ' ', 'g'),
        |      '\S+@\S+', ' ', 'g'),
        |    '\s+', ' ', 'g'))""".stripMargin
    s"""WITH staged AS (
      |  SELECT doc_id, source,
      |    len($w) AS n_words,
      |    len(list_filter($w, x -> x IN ${markersSql(enMarkers)})) AS stop_hits,
      |    md5($cleanSql) AS fp
      |  FROM documents
      |), flagged AS (
      |  SELECT *,
      |    n_words >= 40 AND CAST(stop_hits AS DOUBLE) / n_words <= 0.12 AS quality_ok,
      |    doc_id = MIN(doc_id) OVER (PARTITION BY fp) AS is_canonical
      |  FROM staged
      |), ranked AS (
      |  SELECT *, quality_ok AND is_canonical AS kept,
      |    ROW_NUMBER() OVER (PARTITION BY source, quality_ok AND is_canonical
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM flagged
      |), marked AS (
      |  SELECT *, kept AND rk <= 10 AS sampled
      |  FROM ranked
      |)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN quality_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok,
      |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |  string_agg(CASE WHEN sampled THEN CAST(doc_id AS VARCHAR) END, ',' ORDER BY doc_id)
      |    AS sample_ids
      |FROM marked GROUP BY source
      |ORDER BY source""".stripMargin
  }

  /** sample_temperature — temperature-scaled source mixing (the standard
    * multilingual/multi-domain rebalancing step: sample source i with
    * probability ∝ nᵢ^T, T = 0.5, so rare sources are RELATIVELY
    * upsampled while big sources still dominate in absolute terms).
    * Per-source keep rate = ⌊1000·√nᵢ/√n_max⌋ permille, realized as the
    * same deterministic doc-id-hash threshold filter as sample_weighted;
    * output is the per-source audit with kept-id checksums.
    *
    * Determinism: the rate derives from exact counts via two IEEE sqrt
    * ops and one divide — bit-identical in the oracle. Scale shape: one
    * count aggregate (tiny, broadcast back), then a scan-speed filter —
    * the mixture never shuffles the corpus. */
  def sampleTemperature(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val mx = counts.agg(max(col("n_docs")).as("mx"))
    val rates = counts.crossJoin(broadcast(mx))
      .withColumn("keep_per_mille",
        floor(lit(1000d) * sqrt(col("n_docs").cast("double"))
          / sqrt(col("mx").cast("double"))).cast("long"))
      .select(col("source"), col("n_docs"), col("keep_per_mille"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .join(broadcast(rates), Seq("source"))
      .withColumn("kept",
        pmod(col("doc_id") * 2654435761L, lit(1000000007L)) % 1000L < col("keep_per_mille"))
      .groupBy(col("source"))
      .agg(max(col("n_docs")).as("n_docs"),
        max(col("keep_per_mille")).as("keep_per_mille"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("doc_id"))).as("kept_id_checksum"))
      .orderBy(col("source"))
  }

  val sampleTemperatureSql: String =
    """WITH counts AS (
      |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
      |), rates AS (
      |  SELECT source, n_docs,
      |    CAST(FLOOR(1000.0 * sqrt(CAST(n_docs AS DOUBLE))
      |      / sqrt(CAST((SELECT MAX(n_docs) FROM counts) AS DOUBLE))) AS BIGINT) AS keep_per_mille
      |  FROM counts
      |), b AS (
      |  SELECT d.doc_id, d.source, r.n_docs, r.keep_per_mille,
      |    (d.doc_id * 2654435761 % 1000000007) % 1000 < r.keep_per_mille AS kept
      |  FROM documents d JOIN rates r USING (source)
      |)
      |SELECT source, MAX(n_docs) AS n_docs, MAX(keep_per_mille) AS keep_per_mille,
      |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN kept THEN doc_id END) AS BIGINT) AS kept_id_checksum
      |FROM b GROUP BY source
      |ORDER BY source""".stripMargin

  /** shard_pack — greedy sequential packing of the corpus into ~fixed-
    * byte training shards per source (the WebDataset/TFRecord shard-
    * building step): docs are laid out in id order within each source,
    * and a doc belongs to the shard where its running byte offset lands
    * (`offset div SHARD_BYTES`) — shards may overflow by less than one
    * doc, the standard greedy discipline. Output is the per-shard
    * manifest: doc count, byte volume, id range, membership checksum —
    * the dataset card a training loader consumes.
    *
    * Scale shape: the per-source byte cumsum runs as a two-pass
    * distributed prefix sum ([[graft.core.Prefix.runningSum]]): docs
    * range-partition by (source, id), each range slice sums locally,
    * and per-slice byte offsets compose via a tiny broadcast — a
    * monster source spreads over all slices instead of serializing
    * onto one task (PlanSpec asserts no Exchange SinglePartition).
    * The rollup output is ∝ corpus bytes / shard size. Byte sizes
    * use octet_length: UTF-8 bytes, not characters. */
  /** Generic greedy shard packer over any relation: rows are laid out
    * in `idCol` order within each `groupCol`, and each row belongs to
    * the shard where its running `bytes` offset lands. Returns the
    * per-shard manifest (counts / bytes / id range / checksum). */
  def shardPackOf(df: DataFrame, groupCol: String, idCol: String,
                  bytes: org.apache.spark.sql.Column, shardBytes: Long): DataFrame = {
    Prefix.runningSum(df.select(col(groupCol), col(idCol), bytes.as("nb")),
        Seq(groupCol), Seq(col(idCol)), col("nb"), "cum")
      .withColumn("shard_id", expr(s"(cum - nb) div $shardBytes"))
      .groupBy(col(groupCol), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nb")).as("shard_bytes"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"),
        sum(col(idCol)).as("id_checksum"))
  }

  def shardPack(spark: SparkSession, dir: String): DataFrame =
    shardPackOf(Tables.documents(spark, dir), "source", "doc_id",
      octet_length(col("text")), 4096L)
      .orderBy(col("source"), col("shard_id"))

  val shardPackSql: String =
    """WITH b AS (
      |  SELECT doc_id, source, octet_length(encode(text)) AS nb FROM documents
      |), c AS (
      |  SELECT doc_id, source, nb,
      |    SUM(nb) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM b
      |)
      |SELECT source, CAST((cum - nb) // 4096 AS BIGINT) AS shard_id, COUNT(*) AS n_docs,
      |  CAST(SUM(nb) AS BIGINT) AS shard_bytes,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
      |FROM c GROUP BY 1, 2
      |ORDER BY source, shard_id""".stripMargin

  /** text_vocab — corpus vocabulary profile per language: token volume,
    * vocabulary size, hapax count (words occurring exactly once — the
    * long tail that dominates tokenizer training decisions), type-token
    * ratio, and the dominant word. Two aggregations: explode →
    * (lang, word) counts with map-side combine (shuffle ∝ distinct
    * words, not tokens), then a per-language rollup where the dominant
    * word rides as a lexicographic max(struct) — no window, partial-agg
    * friendly all the way. */
  def textVocab(spark: SparkSession, dir: String): DataFrame = {
    val wc = Tables.documents(spark, dir)
      .select(col("lang"), explode(words(col("text"))).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("n"))
    wc.groupBy(col("lang"))
      .agg(sum(col("n")).as("n_tokens"),
        count(lit(1)).as("vocab_size"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("hapax_count"),
        max(struct(col("n"), col("w"))).as("m"))
      .withColumn("ttr", col("vocab_size").cast("double") / col("n_tokens"))
      .select(col("lang"), col("n_tokens"), col("vocab_size"), col("hapax_count"),
        col("ttr"), col("m.w").as("top_word"), col("m.n").as("top_word_n"))
      .orderBy(col("lang"))
  }

  val textVocabSql: String =
    s"""WITH wc AS (
      |  SELECT lang, w, COUNT(*) AS n FROM (
      |    SELECT lang, unnest(${wordsSql("text")}) AS w FROM documents)
      |  GROUP BY 1, 2
      |), roll AS (
      |  SELECT lang, CAST(SUM(n) AS BIGINT) AS n_tokens, COUNT(*) AS vocab_size,
      |    CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count
      |  FROM wc GROUP BY 1
      |), top AS (
      |  SELECT lang, w AS top_word, n AS top_word_n,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, w DESC) AS rn
      |  FROM wc
      |)
      |SELECT r.lang, r.n_tokens, r.vocab_size, r.hapax_count,
      |  CAST(r.vocab_size AS DOUBLE) / r.n_tokens AS ttr,
      |  t.top_word, t.top_word_n
      |FROM roll r JOIN top t ON r.lang = t.lang AND t.rn = 1
      |ORDER BY r.lang""".stripMargin

  /** text_bpe_pairs — the counting step of one BPE merge round, the
    * tokenizer-training kernel: corpus-wide adjacent-symbol-pair
    * frequencies over whitespace words (symbols = characters at
    * iteration zero), top-20 pairs by count. Looped with the winning
    * merge applied per round this IS BPE training; the pair count is
    * the scale problem — explode ∝ corpus characters — and it shuffles
    * only distinct pairs after map-side combine. The top-k is a sort
    * of the (tiny) aggregated pair table. */
  def textBpePairs(spark: SparkSession, dir: String): DataFrame = {
    // one native kernel call per doc (CharPairs) replaces an explode row
    // per word plus an interpreted per-character lambda — the pair
    // stream goes straight into the map-side-combining count
    val pairs = Tables.documents(spark, dir)
      .select(explode(org.apache.spark.sql.graftvec.NgramExpressions
        .charPairs(words(col("text")))).as("pair"))
    pairs.groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)
  }

  val textBpePairsSql: String =
    s"""WITH w AS (
      |  SELECT unnest(${wordsSql("text")}) AS w FROM documents
      |), cs AS (
      |  SELECT string_split(w, '') AS cs FROM w
      |), p AS (
      |  SELECT unnest(list_transform(range(1, len(cs)), i -> cs[i] || cs[i+1])) AS pair
      |  FROM cs WHERE len(cs) >= 2
      |)
      |SELECT pair, COUNT(*) AS n FROM p GROUP BY pair
      |ORDER BY n DESC, pair
      |LIMIT 20""".stripMargin

  /** sample_split_leakage — train/test contamination audit: the
    * deterministic hash-split assignment crossed with exact-dup
    * fingerprints of the CLEANED text (scrub-then-fingerprint, the
    * text_clean key). A fingerprint whose copies span different splits
    * leaks training text into eval — the leak dedup must catch BEFORE
    * the split is trusted. Output: one row per split-membership
    * signature ("train", "test,train", …) with fingerprint/doc counts
    * and a leaky flag.
    *
    * The synthetic corpus has no natural exact duplicates, so copies
    * are planted (every doc_id%11==0 doc re-keyed at +1000000, the
    * dedup family's planted-corpus discipline): the re-keyed copy
    * hashes into an independent split, so real cross-split leaks exist
    * and the audit must find exactly them — replayed identically in
    * the oracle.
    *
    * Scale shape: one scan computes fp + split per row; one shuffle
    * groups by fingerprint (map-side combined); the signature rollup is
    * tiny. At 100 TB this is the cheapest possible leakage check —
    * no pairwise compare, just two keyed aggregations. */
  def sampleSplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val clean = trim(regexp_replace(
      regexp_replace(
        regexp_replace(lower(col("text")), "https?://\\S+", " "),
        "\\S+@\\S+", " "),
      "\\s+", " "))
    val bucket = pmod(col("doc_id") * 2654435761L, lit(1000000007L)) % 100L
    val base = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val planted = base.unionByName(
      base.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    planted
      .select(col("doc_id"), md5(clean.cast("binary")).as("fp"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"))
      .groupBy(col("fp"))
      .agg(array_join(array_sort(collect_set(col("split"))), ",").as("splits"),
        count(lit(1)).as("n_copies"))
      .groupBy(col("splits"))
      .agg(count(lit(1)).as("n_fingerprints"),
        sum(col("n_copies")).as("n_docs"))
      .withColumn("leaky", col("splits").contains(","))
      .orderBy(col("splits"))
  }

  val sampleSplitLeakageSql: String = {
    val cleanSql =
      """trim(regexp_replace(
        |    regexp_replace(
        |      regexp_replace(lower(text), 'https?://\S+', ' ', 'g'),
        |      '\S+@\S+', ' ', 'g'),
        |    '\s+', ' ', 'g'))""".stripMargin
    s"""WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 11 = 0
      |), b AS (
      |  SELECT doc_id, md5($cleanSql) AS fp,
      |    CASE WHEN (doc_id * 2654435761 % 1000000007) % 100 < 80 THEN 'train'
      |         WHEN (doc_id * 2654435761 % 1000000007) % 100 < 90 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM corpus
      |), f AS (
      |  SELECT fp, string_agg(DISTINCT split, ',' ORDER BY split) AS splits,
      |    COUNT(*) AS n_copies
      |  FROM b GROUP BY fp
      |)
      |SELECT splits, COUNT(*) AS n_fingerprints,
      |  CAST(SUM(n_copies) AS BIGINT) AS n_docs,
      |  splits LIKE '%,%' AS leaky
      |FROM f GROUP BY splits
      |ORDER BY splits""".stripMargin
  }

  // ---- PII scrub ----------------------------------------------------------

  // Detection patterns: kept to the regex subset Java (Spark) and RE2
  // (DuckDB) match identically — character classes, bounded repeats, \b.
  // No backreferences, no lookaround.
  private val EmailRe = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
  private val Ipv4Re = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  private val PhoneRe = """\b555-\d{4}\b"""

  /** The PII-planted corpus: the synthetic documents contain no natural
    * PII, so docs where doc_id % 7 == 0 get a deterministic contact
    * sentence (email + IPv4 + phone) appended — the same planted-drift
    * pattern the dedup corpus uses, replayed identically in the oracle
    * so detection recall is exactly checkable. */
  private def piiCorpus(dir: String)(implicit spark: SparkSession): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .withColumn("text",
        when(col("doc_id") % 7 === 0,
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"), lit("@example.com on 10.0."),
            pmod(col("doc_id"), lit(256L)).cast("string"), lit(".7 or 555-"),
            lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0")))
          .otherwise(col("text")))

  private val piiCorpusSql: String =
    """SELECT doc_id,
  CASE WHEN doc_id % 7 = 0
    THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com on 10.0.' ||
      CAST(doc_id % 256 AS VARCHAR) || '.7 or 555-' ||
      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
    ELSE text END AS text
      |FROM documents""".stripMargin

  /** text_pii — PII detection + redaction over the corpus: per-doc match
    * counts for e-mail / IPv4 / phone patterns, a redacted text whose
    * fingerprint proves the scrub is deterministic, and a pii_found
    * flag. Pure per-row regex work — map-only, embarrassingly parallel,
    * no shuffle except the presentation sort. At 100 TB this is the
    * canonical pre-training scrub pass: runs at scan speed, and the
    * redacted fingerprint lets a second run verify idempotence. */
  /** Generic PII scrub of any (id, text) relation: per-row match counts
    * for each pattern kind, the redacted text, and a found flag.
    * Map-only — composes into any ingest pipeline at scan speed. */
  def piiScrubOf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>")
    docs.select(col(idCol),
      size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(Ipv4Re), lit(0))).as("n_ips"),
      size(regexp_extract_all(col(textCol), lit(PhoneRe), lit(0))).as("n_phones"),
      redacted.as("redacted"))
      .withColumn("pii_found",
        col("n_emails") + col("n_ips") + col("n_phones") > 0)
  }

  def textPii(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    piiScrubOf(piiCorpus(dir), "doc_id", "text")
      .withColumn("redacted_fp", md5(col("redacted").cast("binary")))
      .drop("redacted")
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
        col("redacted_fp"), col("pii_found"))
      .orderBy(col("doc_id"))
  }

  val textPiiSql: String =
    s"""WITH corpus AS ($piiCorpusSql)
      |SELECT doc_id,
      |  len(regexp_extract_all(text, '$EmailRe')) AS n_emails,
      |  len(regexp_extract_all(text, '$Ipv4Re')) AS n_ips,
      |  len(regexp_extract_all(text, '$PhoneRe')) AS n_phones,
      |  md5(regexp_replace(regexp_replace(regexp_replace(text,
      |    '$EmailRe', '<EMAIL>', 'g'), '$Ipv4Re', '<IP>', 'g'), '$PhoneRe', '<PHONE>', 'g'))
      |    AS redacted_fp,
      |  len(regexp_extract_all(text, '$EmailRe')) +
      |    len(regexp_extract_all(text, '$Ipv4Re')) +
      |    len(regexp_extract_all(text, '$PhoneRe')) > 0 AS pii_found
      |FROM corpus
      |ORDER BY doc_id""".stripMargin

  /** Minimum corpus-wide document frequency for a word to be ranked —
    * drops hapax/typo noise from the distinctive-terms profile. */
  val DistinctiveMinDf = 5
  val DistinctiveTopK = 5

  /** text_distinctive_terms — the per-source distinctive vocabulary:
    * for each source, the top-5 words by domain lift
    * = (df_source / n_docs_source) / (df_global / n_docs_total),
    * the "what is this domain about" profile used to audit corpus
    * mixes and spot crawl contamination. Document frequencies (docs
    * containing the word, not token counts) make the lift robust to
    * repetitive docs.
    *
    * Determinism: the lift is ONE IEEE divide of two exact long
    * products (df_s·N over N_s·df_g — both < 2^53 for corpora up to
    * ~90M docs; a larger deployment moves the carriers to
    * DECIMAL(38)), so ranking and values replay exactly in the oracle.
    *
    * Scale shape: distinct (doc, word) explode → one (source, word)
    * aggregation with map-side combine (shuffle ∝ per-source
    * vocabulary, not tokens); the global df and per-source doc counts
    * broadcast back; the top-k window partitions by source over its
    * vocabulary — bounded by distinct words, never corpus volume. */
  def textDistinctiveTerms(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val docWords = docs
      .select(col("doc_id"), col("source"),
        explode(array_distinct(words(col("text")))).as("w"))
    val bySource = docWords.groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("df_source"))
    val global = bySource.groupBy(col("w"))
      .agg(sum(col("df_source")).as("df_global"))
      .filter(col("df_global") >= DistinctiveMinDf)
    val srcDocs = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs_source"))
    val total = docs.agg(count(lit(1)).as("n_docs_total"))
    val scored = bySource
      .join(global, Seq("w"))
      .join(broadcast(srcDocs), Seq("source"))
      .crossJoin(broadcast(total))
      .withColumn("lift",
        (col("df_source") * col("n_docs_total")).cast("double") /
          (col("n_docs_source") * col("df_global")).cast("double"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("lift").desc, col("w"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= DistinctiveTopK)
      .select(col("source"), col("rank").cast("long").as("rank"), col("w").as("word"),
        col("df_source"), col("df_global"), col("lift"))
      .orderBy(col("source"), col("rank"))
  }

  /** text_docstats_drift — distribution drift between the registered
    * corpus and an arriving crawl delta (the ingestion-gate question:
    * "does the new crawl look like the corpus we trained on?"): doc
    * byte lengths histogram into 100-byte buckets (top bucket open) on
    * both sides, and the drift report carries per-bucket counts,
    * fractions, and the total-variation / L1 distance. The planted
    * delta ([[Dedup.incrementalDelta]]) mixes unchanged copies with
    * shortened docs, so the length distribution genuinely shifts.
    *
    * Determinism: fractions and L1 derive from EXACT integer carriers —
    * the per-bucket term is |c_idx·n_delta − c_delta·n_idx| (a long;
    * < 2^63 for corpora to ~3e9 docs, then DECIMAL(38)), summed
    * exactly, with ONE IEEE divide by n_idx·n_delta at the end — so a
    * float summation order never touches the hash. Row bucket = -1 is
    * the corpus-level summary; l1_part sums to the total variation
    * distance × 2.
    *
    * Scale shape: two map-only bucketing scans + two ≤20-row
    * aggregations, a full-outer join of the tiny histograms, totals
    * broadcast back. Output ∝ buckets. */
  def textDocstatsDrift(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    def hist(df: DataFrame, cnt: String) = df
      .select(least(floor(octet_length(col("text")) / 100L), lit(19L)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as(cnt))
    val hIdx = hist(base, "n_index")
    val hDelta = hist(graft.operators.Dedup.incrementalDelta(base), "n_delta")
    val joined = hIdx.join(hDelta, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_index"), lit(0L)).as("n_index"),
        coalesce(col("n_delta"), lit(0L)).as("n_delta"))
    val totals = joined.agg(sum(col("n_index")).as("t_index"),
      sum(col("n_delta")).as("t_delta"))
    val perBucket = joined.crossJoin(broadcast(totals))
      .withColumn("drift_carrier",
        abs(col("n_index") * col("t_delta") - col("n_delta") * col("t_index")))
      .withColumn("frac_index", col("n_index").cast("double") / col("t_index"))
      .withColumn("frac_delta", col("n_delta").cast("double") / col("t_delta"))
      .withColumn("l1_part",
        col("drift_carrier").cast("double") / (col("t_index") * col("t_delta")).cast("double"))
    val summary = perBucket
      .groupBy(col("t_index"), col("t_delta"))
      .agg(sum(col("drift_carrier")).as("drift_carrier"))
      .select(lit(-1L).as("bucket"), col("t_index").as("n_index"),
        col("t_delta").as("n_delta"), col("drift_carrier"),
        lit(1.0d).as("frac_index"), lit(1.0d).as("frac_delta"),
        (col("drift_carrier").cast("double") /
          (col("t_index") * col("t_delta")).cast("double")).as("l1_part"))
    perBucket.drop("t_index", "t_delta")
      .select(col("bucket"), col("n_index"), col("n_delta"), col("drift_carrier"),
        col("frac_index"), col("frac_delta"), col("l1_part"))
      .unionByName(summary)
      .orderBy(col("bucket"))
  }

  val textDocstatsDriftSql: String =
    s"""WITH delta AS (
      |${graft.operators.Dedup.incrementalDeltaSql}
      |),
      |hi AS (
      |  SELECT LEAST(octet_length(encode(text)) // 100, 19) AS bucket,
      |    COUNT(*) AS n_index
      |  FROM documents GROUP BY 1
      |),
      |hd AS (
      |  SELECT LEAST(octet_length(encode(text)) // 100, 19) AS bucket,
      |    COUNT(*) AS n_delta
      |  FROM delta GROUP BY 1
      |),
      |j AS (
      |  SELECT COALESCE(hi.bucket, hd.bucket) AS bucket,
      |    COALESCE(n_index, 0) AS n_index, COALESCE(n_delta, 0) AS n_delta
      |  FROM hi FULL OUTER JOIN hd ON hi.bucket = hd.bucket
      |),
      |t AS (SELECT CAST(SUM(n_index) AS BIGINT) AS t_index,
      |             CAST(SUM(n_delta) AS BIGINT) AS t_delta FROM j),
      |pb AS (
      |  SELECT bucket, n_index, n_delta,
      |    ABS(n_index * t_delta - n_delta * t_index) AS drift_carrier,
      |    CAST(n_index AS DOUBLE) / t_index AS frac_index,
      |    CAST(n_delta AS DOUBLE) / t_delta AS frac_delta,
      |    CAST(ABS(n_index * t_delta - n_delta * t_index) AS DOUBLE)
      |      / CAST(t_index * t_delta AS DOUBLE) AS l1_part
      |  FROM j CROSS JOIN t
      |)
      |SELECT bucket, n_index, n_delta, CAST(drift_carrier AS BIGINT) AS drift_carrier,
      |  frac_index, frac_delta, l1_part FROM pb
      |UNION ALL
      |SELECT -1, t_index, t_delta, CAST(SUM(drift_carrier) AS BIGINT),
      |  1.0, 1.0,
      |  CAST(SUM(drift_carrier) AS DOUBLE) / CAST(t_index * t_delta AS DOUBLE)
      |FROM pb CROSS JOIN t GROUP BY t_index, t_delta
      |ORDER BY bucket""".stripMargin

  val textDistinctiveTermsSql: String =
    s"""WITH dw AS (
      |  SELECT DISTINCT doc_id, source, w FROM (
      |    SELECT doc_id, source, unnest(${wordsSql("text")}) AS w FROM documents)
      |), by_source AS (
      |  SELECT source, w, COUNT(*) AS df_source FROM dw GROUP BY 1, 2
      |), global AS (
      |  SELECT w, CAST(SUM(df_source) AS BIGINT) AS df_global FROM by_source
      |  GROUP BY 1 HAVING SUM(df_source) >= $DistinctiveMinDf
      |), src_docs AS (
      |  SELECT source, COUNT(*) AS n_docs_source FROM documents GROUP BY 1
      |), total AS (SELECT COUNT(*) AS n_docs_total FROM documents),
      |scored AS (
      |  SELECT b.source, b.w, b.df_source, g.df_global,
      |    CAST(b.df_source * t.n_docs_total AS DOUBLE)
      |      / CAST(s.n_docs_source * g.df_global AS DOUBLE) AS lift
      |  FROM by_source b JOIN global g USING (w)
      |    JOIN src_docs s USING (source) CROSS JOIN total t
      |)
      |SELECT source, rank, w AS word, df_source, df_global, lift FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
      |    ORDER BY lift DESC, w) AS rank
      |  FROM scored
      |)
      |WHERE rank <= $DistinctiveTopK
      |ORDER BY source, rank""".stripMargin

  /** sample_class_balance — equalize class sizes to the smallest class
    * (the balanced-training-set cut): per language, keep exactly
    * `quota = min class size` documents, selected in deterministic
    * hash order (the sample_stratified discipline — md5 of the id is
    * the reproducible shuffle, id the tiebreak), so re-runs and both
    * engines pick the SAME docs. The quota is one broadcast scalar;
    * selection is the per-class ranked cut. Output carries quota and
    * rank so the audit ("every class at exactly quota") is a group-by
    * away. */
  def sampleClassBalance(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val quota = counts.agg(min(col("n")).as("quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"))
      .withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(quota))
      .filter(col("rk") <= col("quota"))
      .orderBy(col("lang"), col("rk"))
  }

  val sampleClassBalanceSql: String =
    """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
      |q AS (SELECT MIN(n) AS quota FROM c),
      |r AS (
      |  SELECT doc_id, lang, source,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents
      |)
      |SELECT doc_id, lang, source, rk, quota
      |FROM r, q WHERE rk <= quota
      |ORDER BY lang, rk""".stripMargin

  /** text_sentences — per-document sentence segmentation stats: segments
    * split on terminal-punctuation runs ([.!?]+), trimmed, empties
    * dropped; count, exact char totals, longest sentence, and the mean
    * sentence length as ONE IEEE divide of exact ints (the readability
    * signal feeding quality filters — wall-of-text and choppy-fragment
    * docs both read as anomalous here, invisible to word counts alone).
    * Map-only builtin HOFs over each doc (no shuffle before the
    * presentation sort); the regex subset is Java∩RE2 so the oracle
    * replays the split byte-identically. */
  def textSentences(spark: SparkSession, dir: String): DataFrame = {
    val segs = filter(
      transform(split(col("text"), "[.!?]+"), s => trim(s)),
      s => s =!= lit(""))
    Tables.documents(spark, dir)
      .select(col("doc_id"), segs.as("segs"))
      .select(col("doc_id"),
        size(col("segs")).as("n_sentences"),
        aggregate(transform(col("segs"), s => length(s).cast("long")),
          lit(0L), (acc, x) => acc + x).as("sent_chars"),
        array_max(transform(col("segs"), s => length(s))).as("max_sentence_chars"))
      .withColumn("avg_sentence_chars",
        when(col("n_sentences") > 0,
          col("sent_chars").cast("double") / col("n_sentences").cast("double")))
      .withColumn("shape_class",
        when(col("n_sentences") === 0, "EMPTY")
          .when(col("avg_sentence_chars") < 40.0d, "CHOPPY")
          .when(col("avg_sentence_chars") > 400.0d, "WALL_OF_TEXT")
          .otherwise("OK"))
      .orderBy(col("doc_id"))
  }

  val textSentencesSql: String =
    """WITH segd AS (
      |  SELECT doc_id,
      |    list_filter(list_transform(string_split_regex(text, '[.!?]+'),
      |      s -> trim(s)), s -> s <> '') AS segs
      |  FROM documents
      |), m AS (
      |  SELECT doc_id,
      |    len(segs) AS n_sentences,
      |    COALESCE(CAST(list_sum(list_transform(segs, s -> length(s))) AS BIGINT), 0) AS sent_chars,
      |    CAST(list_max(list_transform(segs, s -> length(s))) AS INTEGER) AS max_sentence_chars
      |  FROM segd
      |)
      |SELECT doc_id, n_sentences, sent_chars, max_sentence_chars,
      |  CASE WHEN n_sentences > 0
      |       THEN CAST(sent_chars AS DOUBLE) / CAST(n_sentences AS DOUBLE) END AS avg_sentence_chars,
      |  CASE WHEN n_sentences = 0 THEN 'EMPTY'
      |       WHEN CAST(sent_chars AS DOUBLE) / CAST(n_sentences AS DOUBLE) < 40.0 THEN 'CHOPPY'
      |       WHEN CAST(sent_chars AS DOUBLE) / CAST(n_sentences AS DOUBLE) > 400.0 THEN 'WALL_OF_TEXT'
      |       ELSE 'OK' END AS shape_class
      |FROM m
      |ORDER BY doc_id""".stripMargin

  /** shard_balance — balance audit of shard_pack's output: per source,
    * the shard count, exact byte totals, smallest/largest shard, mean
    * shard fill and fill fraction of the 4096-byte target — each ratio
    * ONE IEEE divide of exact longs. This is the check that decides
    * whether packed training shards feed a reader evenly (a tail shard
    * at 3% fill or one source packing 10× more shards than its data
    * share both surface here first). Rolls the ≤#shards manifest up to
    * ≤#sources rows — negligible compute after the pack itself. */
  def shardBalance(spark: SparkSession, dir: String): DataFrame =
    shardPackOf(Tables.documents(spark, dir), "source", "doc_id",
      octet_length(col("text")), 4096L)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_shards"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("shard_bytes")).as("total_bytes"),
        min(col("shard_bytes")).as("min_shard_bytes"),
        max(col("shard_bytes")).as("max_shard_bytes"))
      .withColumn("avg_shard_bytes",
        col("total_bytes").cast("double") / col("n_shards").cast("double"))
      .withColumn("fill_frac",
        col("total_bytes").cast("double") / (col("n_shards") * lit(4096L)).cast("double"))
      .orderBy(col("source"))

  val shardBalanceSql: String =
    s"""WITH pack AS ($shardPackSql)
      |SELECT source, COUNT(*) AS n_shards,
      |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
      |  CAST(SUM(shard_bytes) AS BIGINT) AS total_bytes,
      |  MIN(shard_bytes) AS min_shard_bytes,
      |  MAX(shard_bytes) AS max_shard_bytes,
      |  CAST(CAST(SUM(shard_bytes) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_shard_bytes,
      |  CAST(CAST(SUM(shard_bytes) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) * 4096 AS DOUBLE) AS fill_frac
      |FROM pack GROUP BY source
      |ORDER BY source""".stripMargin

  /** text_bm25_terms — per-document top-5 distinctive terms by a
    * BM25-shaped rarity weight: tf · (N − df + 0.5)/(df + 0.5). The idf
    * is the BM25 odds form WITHOUT the log — the ordering is identical
    * (ln is monotone) and every step is an IEEE correctly-rounded
    * mult/divide on exact integers, so Spark and DuckDB agree
    * bit-for-bit where a `ln` would be libm-dependent. One shuffle for
    * (doc, term) counts, one vocab-keyed join for df (vocab-sized —
    * NOT broadcast; at corpus scale it doesn't fit), a per-doc window
    * for the top-5 with term as the total tie-break. This is the
    * per-document keyword view; `text_distinctive_terms` is the same
    * signal at per-source granularity. */
  def textBm25Terms(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val win = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("w"))
    tf.join(dfreq, "w").crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * ((col("n_docs") - col("df")).cast("double") + 0.5d) /
          (col("df").cast("double") + 0.5d))
      .withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("doc_id"), col("rank"), col("w").as("term"),
        col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  val textBm25TermsSql: String =
    s"""WITH tf AS (
      |  SELECT doc_id, w, COUNT(*) AS tf FROM (
      |    SELECT doc_id, unnest(${wordsSql("text")}) AS w FROM documents)
      |  WHERE w <> '' GROUP BY 1, 2
      |),
      |dfq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
      |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.w, tf.tf, dfq.df,
      |    CAST(tf.tf AS DOUBLE) *
      |      (CAST((SELECT n_docs FROM nd) - dfq.df AS DOUBLE) + 0.5) /
      |      (CAST(dfq.df AS DOUBLE) + 0.5) AS score
      |  FROM tf JOIN dfq USING (w)
      |),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rank
      |  FROM scored
      |)
      |SELECT doc_id, rank, w AS term, tf, df, score
      |FROM ranked WHERE rank <= 5
      |ORDER BY doc_id, rank""".stripMargin

  /** text_charset_profile — per-source character-class mix over the RAW
    * text (not normText: a charset audit must see what ingestion saw):
    * alpha / digit / whitespace / other counts as exact longs (length
    * minus length-after-strip, all map-side regexp work), ratios by one
    * IEEE divide each. This is the mojibake / binary-contamination /
    * wrong-decoder gate — a source whose `other` ratio jumps between
    * crawls changed encoding, not content. The whitespace class is the
    * explicit [ \\t\\n\\r] so the Java and RE2 regex engines agree. */
  def textCharsetProfile(spark: SparkSession, dir: String): DataFrame = {
    // the census is the native one-pass CharClassCounts kernel: the
    // composable form (length + three regexp_replace strip-counts, kept
    // as the oracle and pinned ≡ in SketchKernelSpec) walks the string
    // four times and allocates three stripped copies per row
    import org.apache.spark.sql.graftvec.CharClassExpressions.charClassCounts
    val t = Tables.documents(spark, dir)
      .select(col("source"), charClassCounts(col("text")).as("cc"))
      .select(col("source"),
        col("cc").getItem(0).as("n_chars"),
        col("cc").getItem(1).as("n_alpha"),
        col("cc").getItem(2).as("n_digit"),
        col("cc").getItem(3).as("n_space"))
    t.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_alpha")).as("n_alpha"),
        sum(col("n_digit")).as("n_digit"),
        sum(col("n_space")).as("n_space"))
      .withColumn("n_other",
        col("n_chars") - col("n_alpha") - col("n_digit") - col("n_space"))
      .withColumn("alpha_ratio",
        col("n_alpha").cast("double") / col("n_chars").cast("double"))
      .withColumn("other_ratio",
        col("n_other").cast("double") / col("n_chars").cast("double"))
      .select(col("source"), col("n_docs"), col("n_chars"), col("n_alpha"),
        col("n_digit"), col("n_space"), col("n_other"),
        col("alpha_ratio"), col("other_ratio"))
      .orderBy(col("source"))
  }

  val textCharsetProfileSql: String =
    """WITH t AS (
      |  SELECT source,
      |    CAST(length(text) AS BIGINT) AS n_chars,
      |    CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
      |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
      |    CAST(length(text) - length(regexp_replace(text, '[ \t\n\r]', '', 'g')) AS BIGINT) AS n_space
      |  FROM documents
      |),
      |agg AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
      |    CAST(SUM(n_alpha) AS BIGINT) AS n_alpha,
      |    CAST(SUM(n_digit) AS BIGINT) AS n_digit,
      |    CAST(SUM(n_space) AS BIGINT) AS n_space
      |  FROM t GROUP BY 1
      |)
      |SELECT source, n_docs, n_chars, n_alpha, n_digit, n_space,
      |  n_chars - n_alpha - n_digit - n_space AS n_other,
      |  CAST(n_alpha AS DOUBLE) / CAST(n_chars AS DOUBLE) AS alpha_ratio,
      |  CAST(n_chars - n_alpha - n_digit - n_space AS DOUBLE) /
      |    CAST(n_chars AS DOUBLE) AS other_ratio
      |FROM agg
      |ORDER BY source""".stripMargin

  /** sample_kfold — deterministic 5-fold assignment by the portable
    * Knuth multiplicative hash (decorrelated from sample_hash_split's
    * buckets by a different multiplier), audited for per-language
    * balance: each (fold, lang) cell carries its exact deviation
    * n·K − lang_total (a perfectly balanced fold has 0) and the skew
    * factor n·K / lang_total by ONE IEEE divide. Map-side hash, one
    * small-cardinality aggregate — the split itself never shuffles
    * documents. This is the cross-validation twin of the train/val/test
    * splitter; the balance audit is what catches a hash that aliases
    * with the id-assignment pattern. */
  def sampleKfold(spark: SparkSession, dir: String): DataFrame = {
    val folds = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .withColumn("fold", pmod(col("doc_id") * 2654435789L, lit(1000000007L)) % 5L)
    val langTotals = folds.groupBy(col("lang")).agg(count(lit(1)).as("lang_total"))
    folds.groupBy(col("fold"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_checksum"))
      .join(broadcast(langTotals), "lang")
      .withColumn("balance_dev", col("n_docs") * 5L - col("lang_total"))
      .withColumn("skew",
        (col("n_docs") * 5L).cast("double") / col("lang_total").cast("double"))
      .select(col("fold"), col("lang"), col("n_docs"), col("id_checksum"),
        col("lang_total"), col("balance_dev"), col("skew"))
      .orderBy(col("fold"), col("lang"))
  }

  val sampleKfoldSql: String =
    """WITH f AS (
      |  SELECT doc_id, lang, (doc_id * 2654435789 % 1000000007) % 5 AS fold
      |  FROM documents
      |),
      |lt AS (SELECT lang, COUNT(*) AS lang_total FROM f GROUP BY 1)
      |SELECT fold, lang, COUNT(*) AS n_docs,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
      |  lang_total,
      |  COUNT(*) * 5 - lang_total AS balance_dev,
      |  CAST(COUNT(*) * 5 AS DOUBLE) / CAST(lang_total AS DOUBLE) AS skew
      |FROM f JOIN lt USING (lang)
      |GROUP BY fold, lang, lang_total
      |ORDER BY fold, lang""".stripMargin

  /** sample_quota_by_source — per-source quota sampling: keep at most
    * Q = 100 docs per source, chosen by deterministic hash rank (Knuth
    * multiplier decorrelated from the split/fold hashes, doc_id
    * tie-break) — the corpus-mix rebalancer that stops one crawl
    * domain from swamping the mixture. Output is the per-source
    * admission report: kept/dropped, whether the quota bound, and the
    * kept-set checksum so the selection itself is oracle-pinned, not
    * just its size. The rank window partitions per source (bounded by
    * that source's docs); docs never shuffle twice. */
  def sampleQuotaBySource(spark: SparkSession, dir: String): DataFrame = {
    val Q = 100L
    val ranked = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("hk", pmod(col("doc_id") * 2654435741L, lit(1000000007L)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))).cast("long"))
      .withColumn("kept", col("rank") <= Q)
    ranked.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("doc_id")).otherwise(0L)).as("kept_checksum"))
      .withColumn("n_dropped", col("n_docs") - col("n_kept"))
      .withColumn("quota_bound", col("n_docs") > Q)
      .select(col("source"), col("n_docs"), col("n_kept"), col("n_dropped"),
        col("kept_checksum"), col("quota_bound"))
      .orderBy(col("source"))
  }

  val sampleQuotaBySourceSql: String =
    """WITH ranked AS (
      |  SELECT doc_id, source,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY doc_id * 2654435741 % 1000000007, doc_id) AS rank
      |  FROM documents
      |)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN rank <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  COUNT(*) - CAST(SUM(CASE WHEN rank <= 100 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dropped,
      |  CAST(SUM(CASE WHEN rank <= 100 THEN doc_id ELSE 0 END) AS BIGINT)
      |    AS kept_checksum,
      |  COUNT(*) > 100 AS quota_bound
      |FROM ranked GROUP BY source
      |ORDER BY source""".stripMargin

  /** text_zipf_slope — per-language Zipf's-law fit: OLS slope of
    * log(frequency) against log(rank) over the corpus vocabulary, with
    * intercept and R². A natural-language corpus fits slope ≈ −1; a
    * corpus poisoned by boilerplate or generated spam bends the curve —
    * this is the corpus-health twin of `text_vocab`.
    *
    * Determinism discipline: ln(rank) and ln(freq) are quantized to
    * integral millis (floor(ln·1000 + 0.5) — same IEEE expression both
    * engines), so every OLS sum (Σx, Σy, Σxy, Σx², Σy²) is an exact
    * BIGINT and order-independent; slope/intercept/R² spend a fixed
    * handful of double ops per language at the end. Quantization biases
    * the fit by < 5e-4 absolute — irrelevant for a health signal. The
    * BIGINT carriers hold to ~1e8 vocabulary entries per language;
    * beyond that the sums (not the algorithm) move to DECIMAL(38,0).
    *
    * Scale shape: one shuffle to count (lang, word); ranking is a
    * per-language window over the VOCABULARY (sublinear in corpus
    * size — Heaps' law), not the token stream; the OLS reduction is a
    * 5-row aggregate. */
  def textZipfSlope(spark: SparkSession, dir: String): DataFrame = {
    val wc = Tables.documents(spark, dir)
      .select(col("lang"), explode(words(col("text"))).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("n"))
    val ranked = wc.withColumn("rank",
        row_number().over(Window.partitionBy(col("lang"))
          .orderBy(col("n").desc, col("w").asc)))
      .select(col("lang"),
        floor(log(col("rank").cast("double")) * lit(1000d) + lit(0.5d))
          .cast("long").as("xq"),
        floor(log(col("n").cast("double")) * lit(1000d) + lit(0.5d))
          .cast("long").as("yq"))
    ranked.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("xq")).as("sx"), sum(col("yq")).as("sy"),
        sum(col("xq") * col("yq")).as("sxy"),
        sum(col("xq") * col("xq")).as("sxx"),
        sum(col("yq") * col("yq")).as("syy"))
      .withColumn("num", col("n_types") * col("sxy") - col("sx") * col("sy"))
      .withColumn("dxx", col("n_types") * col("sxx") - col("sx") * col("sx"))
      .withColumn("dyy", col("n_types") * col("syy") - col("sy") * col("sy"))
      .withColumn("zipf_slope", col("num").cast("double") / col("dxx").cast("double"))
      .withColumn("zipf_intercept",
        (col("sy").cast("double") - col("zipf_slope") * col("sx").cast("double")) /
          col("n_types").cast("double") / lit(1000d))
      .withColumn("r2", (col("num").cast("double") * col("num").cast("double")) /
        (col("dxx").cast("double") * col("dyy").cast("double")))
      .select(col("lang"), col("n_types"), col("zipf_slope"),
        col("zipf_intercept"), col("r2"))
      .orderBy(col("lang"))
  }

  val textZipfSlopeSql: String =
    s"""WITH wc AS (
      |  SELECT lang, w, COUNT(*) AS n FROM (
      |    SELECT lang, unnest(${wordsSql("text")}) AS w FROM documents)
      |  GROUP BY 1, 2
      |), ranked AS (
      |  SELECT lang,
      |    CAST(FLOOR(ln(CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY n DESC, w ASC) AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS xq,
      |    CAST(FLOOR(ln(CAST(n AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS yq
      |  FROM wc
      |), sums AS (
      |  SELECT lang, COUNT(*) AS n_types,
      |    CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
      |    CAST(SUM(xq*yq) AS BIGINT) AS sxy,
      |    CAST(SUM(xq*xq) AS BIGINT) AS sxx,
      |    CAST(SUM(yq*yq) AS BIGINT) AS syy
      |  FROM ranked GROUP BY 1
      |), fit AS (
      |  SELECT lang, n_types,
      |    n_types*sxy - sx*sy AS num,
      |    n_types*sxx - sx*sx AS dxx,
      |    n_types*syy - sy*sy AS dyy,
      |    sx, sy
      |  FROM sums
      |)
      |SELECT lang, n_types,
      |  CAST(num AS DOUBLE) / CAST(dxx AS DOUBLE) AS zipf_slope,
      |  (CAST(sy AS DOUBLE) - (CAST(num AS DOUBLE) / CAST(dxx AS DOUBLE))
      |    * CAST(sx AS DOUBLE)) / CAST(n_types AS DOUBLE) / 1000 AS zipf_intercept,
      |  (CAST(num AS DOUBLE) * CAST(num AS DOUBLE)) /
      |    (CAST(dxx AS DOUBLE) * CAST(dyy AS DOUBLE)) AS r2
      |FROM fit
      |ORDER BY lang""".stripMargin

  /** text_lm_ce — held-out cross-entropy of a per-language add-one
    * unigram model: docs split train/heldout by the hash-split
    * convention (bucket < 80 trains, ≥ 80 is held out), p(w) =
    * (c(w)+1)/(N+V+1), H = −Σ ln p / M over heldout tokens. The
    * classic LM-based quality score for training data: a corpus slice
    * whose held-out cross-entropy spikes is off-distribution (OCR
    * garbage, spam, wrong language) — this is the aggregate form of
    * the per-doc perplexity filter (CCNet-style), with OOV rate
    * reported alongside.
    *
    * Determinism discipline: ln p is quantized to integral millinats
    * (floor(ln·1000 + 0.5), identical IEEE expression both engines), so
    * the heldout sum is Σ m·lnpq — an exact BIGINT — and cross-entropy
    * is a fixed double tail. Perplexity (exp H) is deliberately NOT
    * emitted: Math.exp/libm exp are not guaranteed correctly rounded,
    * so the nats value is the portable one.
    *
    * Scale shape: ONE token explode and ONE (lang, word) shuffle with
    * map-side combine — both splits count in the same aggregate
    * (conditional sums), so there is no second scan and no
    * train⋈heldout join at all; per-lang scalars broadcast back; 5-row
    * output. */
  def textLmCe(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .withColumn("bucket",
        pmod(col("doc_id") * 2654435761L, lit(1000000007L)) % 100L)
      .select(col("lang"), col("bucket"), explode(words(col("text"))).as("w"))
      .groupBy(col("lang"), col("w"))
      .agg(sum(when(col("bucket") < 80, 1L).otherwise(0L)).as("c0"),
        sum(when(col("bucket") >= 80, 1L).otherwise(0L)).as("m"))
    val scalars = counts.filter(col("c0") > 0L).groupBy(col("lang"))
      .agg(sum(col("c0")).as("n_train_tokens"), count(lit(1)).as("vocab_size"))
    val scored = counts.filter(col("m") > 0L)
      .join(broadcast(scalars), Seq("lang"))
      .withColumn("lnpq",
        floor(log((col("c0") + 1L).cast("double") /
          (col("n_train_tokens") + col("vocab_size") + 1L).cast("double"))
          * lit(1000d) + lit(0.5d)).cast("long"))
    scored.groupBy(col("lang"))
      .agg(max(col("n_train_tokens")).as("n_train_tokens"),
        max(col("vocab_size")).as("vocab_size"),
        sum(col("m")).as("n_heldout_tokens"),
        sum(when(col("c0") === 0L, col("m")).otherwise(0L)).as("oov_tokens"),
        sum(col("m") * col("lnpq")).as("sum_mlnpq"))
      .withColumn("oov_rate",
        col("oov_tokens").cast("double") / col("n_heldout_tokens").cast("double"))
      .withColumn("cross_entropy_nats",
        -col("sum_mlnpq").cast("double") / col("n_heldout_tokens").cast("double")
          / lit(1000d))
      .select(col("lang"), col("n_train_tokens"), col("vocab_size"),
        col("n_heldout_tokens"), col("oov_tokens"), col("oov_rate"),
        col("cross_entropy_nats"))
      .orderBy(col("lang"))
  }

  val textLmCeSql: String =
    s"""WITH toks AS (
      |  SELECT lang, (doc_id * 2654435761 % 1000000007) % 100 AS bucket,
      |    unnest(${wordsSql("text")}) AS w
      |  FROM documents
      |), counts AS (
      |  SELECT lang, w,
      |    CAST(SUM(CASE WHEN bucket < 80 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
      |    CAST(SUM(CASE WHEN bucket >= 80 THEN 1 ELSE 0 END) AS BIGINT) AS m
      |  FROM toks GROUP BY 1, 2
      |), scalars AS (
      |  SELECT lang, CAST(SUM(c0) AS BIGINT) AS n_train_tokens,
      |    COUNT(*) AS vocab_size
      |  FROM counts WHERE c0 > 0 GROUP BY 1
      |), scored AS (
      |  SELECT h.lang, h.m, h.c0,
      |    s.n_train_tokens, s.vocab_size,
      |    CAST(FLOOR(ln(CAST(h.c0 + 1 AS DOUBLE) /
      |      CAST(s.n_train_tokens + s.vocab_size + 1 AS DOUBLE)) * 1000 + 0.5)
      |      AS BIGINT) AS lnpq
      |  FROM counts h
      |  JOIN scalars s ON s.lang = h.lang
      |  WHERE h.m > 0
      |)
      |SELECT lang, MAX(n_train_tokens) AS n_train_tokens,
      |  MAX(vocab_size) AS vocab_size,
      |  CAST(SUM(m) AS BIGINT) AS n_heldout_tokens,
      |  CAST(SUM(CASE WHEN c0 = 0 THEN m ELSE 0 END) AS BIGINT) AS oov_tokens,
      |  CAST(SUM(CASE WHEN c0 = 0 THEN m ELSE 0 END) AS DOUBLE) /
      |    CAST(SUM(m) AS DOUBLE) AS oov_rate,
      |  -CAST(SUM(m * lnpq) AS DOUBLE) / CAST(SUM(m) AS DOUBLE) / 1000
      |    AS cross_entropy_nats
      |FROM scored
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** text_doc_lm_score — the PER-DOCUMENT form of text_lm_ce: every doc
    * scored against the per-language add-one unigram model trained on
    * the hash-split train partition — the CCNet-style perplexity filter
    * itself (text_lm_ce is its corpus-health rollup). Docs classify
    * CLEAN / SUSPECT / JUNK on cross-entropy thresholds compared in
    * EXACT integer cross-multiplied form (S vs τ·1000·M, with τ·1000
    * integral — no double ever enters a class boundary), so the
    * partition is reproducible to the last doc.
    *
    * Determinism: same millinat-quantized ln p as text_lm_ce; per-doc S
    * = −Σ m·lnpq and M are exact BIGINTs; ce_nats spends the double
    * only in the reported value, never in the classification.
    *
    * Scale shape: one (doc, word) count aggregate (∝ corpus tokens,
    * map-side combined), one (lang, word) model join — the model table
    * is Heaps-sublinear in the corpus — then a per-doc rollup. */
  def textDocLmScore(spark: SparkSession, dir: String): DataFrame =
    docLmPerDoc(spark, dir)
      .withColumn("ce_nats", col("s_millinats").cast("double") /
        col("n_tokens").cast("double") / lit(1000d))
      .withColumn("quality_class",
        when(col("s_millinats") > lit(3450L) * col("n_tokens"), "JUNK")
          .when(col("s_millinats") > lit(3420L) * col("n_tokens"), "SUSPECT")
          .otherwise("CLEAN"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("oov_tokens"),
        col("ce_nats"), col("quality_class"))
      .orderBy(col("doc_id"))

  /** Shared per-doc unigram-LM scoring relation: (doc_id, lang,
    * n_tokens, oov_tokens, s_millinats) — the text_doc_lm_score
    * pipeline up to (but excluding) classification, reused by
    * quality_filter_sweep. s_millinats is the exact integer surprisal
    * carrier (Σ m·⌊−ln p·1000⌉), so every downstream threshold is an
    * exact BIGINT comparison. */
  private def docLmPerDoc(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .withColumn("bucket",
        pmod(col("doc_id") * 2654435761L, lit(1000000007L)) % 100L)
      .select(col("doc_id"), col("lang"), col("bucket"),
        explode(words(col("text"))).as("w"))
    val train = toks.filter(col("bucket") < 80)
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
    val scalars = train.groupBy(col("lang"))
      .agg(sum(col("c")).as("n_train"), count(lit(1)).as("v"))
    val docCounts = toks.groupBy(col("doc_id"), col("lang"), col("w"))
      .agg(count(lit(1)).as("m"))
    docCounts
      .join(train, Seq("lang", "w"), "left")
      .withColumn("c0", coalesce(col("c"), lit(0L)))
      .join(broadcast(scalars), Seq("lang"))
      .withColumn("lnpq",
        floor(log((col("c0") + 1L).cast("double") /
          (col("n_train") + col("v") + 1L).cast("double"))
          * lit(1000d) + lit(0.5d)).cast("long"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("m")).as("n_tokens"),
        sum(when(col("c0") === 0L, col("m")).otherwise(0L)).as("oov_tokens"),
        (-sum(col("m") * col("lnpq"))).as("s_millinats"))
  }

  /** Shared oracle CTE chain ending in
    * `per_doc(doc_id, lang, n_tokens, oov_tokens, s_millinats)`. */
  private val docLmPerDocCtes: String =
    s"""toks AS (
      |  SELECT doc_id, lang, (doc_id * 2654435761 % 1000000007) % 100 AS bucket,
      |    unnest(${wordsSql("text")}) AS w
      |  FROM documents
      |), train AS (
      |  SELECT lang, w, COUNT(*) AS c FROM toks WHERE bucket < 80 GROUP BY 1, 2
      |), scalars AS (
      |  SELECT lang, CAST(SUM(c) AS BIGINT) AS n_train, COUNT(*) AS v
      |  FROM train GROUP BY 1
      |), dc AS (
      |  SELECT doc_id, lang, w, COUNT(*) AS m FROM toks GROUP BY 1, 2, 3
      |), scored AS (
      |  SELECT dc.doc_id, dc.lang, dc.m, COALESCE(t.c, 0) AS c0,
      |    CAST(FLOOR(ln(CAST(COALESCE(t.c, 0) + 1 AS DOUBLE) /
      |      CAST(s.n_train + s.v + 1 AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS lnpq
      |  FROM dc
      |  LEFT JOIN train t ON t.lang = dc.lang AND t.w = dc.w
      |  JOIN scalars s ON s.lang = dc.lang
      |), per_doc AS (
      |  SELECT doc_id, lang,
      |    CAST(SUM(m) AS BIGINT) AS n_tokens,
      |    CAST(SUM(CASE WHEN c0 = 0 THEN m ELSE 0 END) AS BIGINT) AS oov_tokens,
      |    CAST(-SUM(m * lnpq) AS BIGINT) AS s_millinats
      |  FROM scored GROUP BY 1, 2
      |)""".stripMargin

  val textDocLmScoreSql: String =
    s"""WITH $docLmPerDocCtes
      |SELECT doc_id, lang, n_tokens, oov_tokens,
      |  CAST(s_millinats AS DOUBLE) / CAST(n_tokens AS DOUBLE) / 1000 AS ce_nats,
      |  CASE WHEN s_millinats > 3450 * n_tokens THEN 'JUNK'
      |       WHEN s_millinats > 3420 * n_tokens THEN 'SUSPECT'
      |       ELSE 'CLEAN' END AS quality_class
      |FROM per_doc
      |ORDER BY doc_id""".stripMargin

  /** Threshold ladder for quality_filter_sweep, in millinats/token —
    * brackets the corpus's CLEAN/SUSPECT/JUNK band (3420/3450). */
  val QualitySweepCuts: Seq[Long] = 3380L to 3480L by 10L

  /** quality_filter_sweep — the cutoff-selection step of a
    * perplexity-style quality filter: for each candidate cross-entropy
    * ceiling, how many documents and how much token mass survive
    * `s_millinats <= cut * n_tokens` (an exact BIGINT comparison on the
    * integer surprisal carrier, so both engines agree bit-for-bit).
    * This is the curve a pipeline owner reads before committing to a
    * filter threshold — the quality twin of dedup_threshold_sweep.
    * Scale shape: the per-doc scoring pass is text_doc_lm_score's; the
    * sweep itself is a docs-sized rollup against an 11-row broadcast
    * grid. Kept-share basis points via non-negative integer DIV. */
  def qualityFilterSweep(spark: SparkSession, dir: String): DataFrame = {
    val cuts = spark.createDataFrame(
      QualitySweepCuts.map(java.lang.Long.valueOf).map(Tuple1(_)))
      .toDF("ce_cut_mn")
    val kept = col("s_millinats") <= col("ce_cut_mn") * col("n_tokens")
    docLmPerDoc(spark, dir)
      .crossJoin(broadcast(cuts))
      .groupBy(col("ce_cut_mn"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tot_tokens"),
        sum(when(kept, 1L).otherwise(0L)).as("n_docs_kept"),
        sum(when(kept, col("n_tokens")).otherwise(0L)).as("n_tokens_kept"))
      .withColumn("docs_kept_bp", expr("(n_docs_kept * 10000L) DIV n_docs"))
      .withColumn("tokens_kept_bp", expr("(n_tokens_kept * 10000L) DIV tot_tokens"))
      .select(col("ce_cut_mn"), col("n_docs_kept"), col("n_tokens_kept"),
        col("docs_kept_bp"), col("tokens_kept_bp"))
      .orderBy(col("ce_cut_mn"))
  }

  lazy val qualityFilterSweepSql: String = {
    val cutList = QualitySweepCuts.mkString("[", ",", "]")
    s"""WITH $docLmPerDocCtes,
      |cuts AS (SELECT unnest($cutList) AS ce_cut_mn)
      |SELECT ce_cut_mn,
      |  CAST(SUM(CASE WHEN s_millinats <= ce_cut_mn * n_tokens THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
      |  CAST(SUM(CASE WHEN s_millinats <= ce_cut_mn * n_tokens THEN n_tokens ELSE 0 END) AS BIGINT) AS n_tokens_kept,
      |  CAST((SUM(CASE WHEN s_millinats <= ce_cut_mn * n_tokens THEN 1 ELSE 0 END) * 10000) // COUNT(*) AS BIGINT) AS docs_kept_bp,
      |  CAST((SUM(CASE WHEN s_millinats <= ce_cut_mn * n_tokens THEN n_tokens ELSE 0 END) * 10000) // SUM(n_tokens) AS BIGINT) AS tokens_kept_bp
      |FROM per_doc CROSS JOIN cuts
      |GROUP BY 1
      |ORDER BY 1""".stripMargin
  }

  /** sample_mixture_plan — corpus-mix allocation planner: given a
    * deterministic per-source demand weight, allocate a fixed document
    * budget proportionally (exact integer arithmetic — weight·budget
    * DIV Σweights, no floats) and report each source's allocation
    * against its actual inventory: binding sources (allocation >
    * inventory) surface as deficit, the "data order" a mixture run
    * would fail to fill. Single-pass allocation by design — the deficit
    * IS the signal; reallocation is a policy layered on this report.
    *
    * Scale shape: one count-by-source aggregate (sources-sized), the
    * weight-sum scalar broadcast back; everything else is per-source
    * integer arithmetic. */
  def sampleMixturePlan(spark: SparkSession, dir: String): DataFrame = {
    val budget = 400L
    val bySource = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("available"))
      .withColumn("weight",
        lit(500L) + pmod(rollingHash(col("source")), lit(1500L)))
    bySource
      .crossJoin(broadcast(bySource.agg(sum(col("weight")).as("wsum"))))
      .withColumn("target_docs", expr(s"(weight * ${budget}L) DIV wsum"))
      .withColumn("allocated", least(col("target_docs"), col("available")))
      .withColumn("deficit", col("target_docs") - col("allocated"))
      .withColumn("fill_rate",
        col("allocated").cast("double") / col("target_docs").cast("double"))
      .select(col("source"), col("available"), col("weight"),
        col("target_docs"), col("allocated"), col("deficit"), col("fill_rate"))
      .orderBy(col("source"))
  }

  /** sample_interleave_schedule — the deterministic data-loader ORDER a
    * weighted mixture run actually reads: weighted fair queueing over
    * sources. Each source's k-th admitted doc (decorrelated-hash rank,
    * the sample_quota_by_source discipline, capped at 15/source) gets
    * virtual time k·10⁹ DIV weight (exact integer — heavier sources'
    * docs arrive at shorter virtual intervals), and the global schedule
    * is the (vt, source, rank) sort — the first 100 positions are the
    * order the loader dequeues. sample_mixture_plan says HOW MANY from
    * each source; this says WHEN, so two runs of the same plan read
    * byte-identical streams.
    *
    * Scale shape: per-source rank windows are bounded per key; the
    * global position window runs over ≤ sources×cap pre-aggregated
    * rows (a few hundred — constant, never corpus-sized; the SURVEY §5
    * bounded-window discipline). Weights share sample_mixture_plan's
    * portable rolling-hash convention. */
  def sampleInterleaveSchedule(spark: SparkSession, dir: String): DataFrame = {
    val cap = 15L
    val ranked = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("hk", pmod(col("doc_id") * 2654435741L, lit(1000000007L)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))).cast("long"))
      .filter(col("rank") <= cap)
      .withColumn("weight",
        lit(500L) + pmod(rollingHash(col("source")), lit(1500L)))
      .withColumn("vt", expr("(rank * 1000000000L) DIV weight"))
    ranked
      .withColumn("position", row_number().over(
        Window.orderBy(col("vt"), col("source"), col("rank"))).cast("long"))
      .filter(col("position") <= 100L)
      .select(col("position"), col("source"), col("doc_id"), col("rank"),
        col("weight"), col("vt"))
      .orderBy(col("position"))
  }

  val sampleInterleaveScheduleSql: String =
    s"""WITH ranked AS (
      |  SELECT doc_id, source,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY doc_id * 2654435741 % 1000000007, doc_id) AS rank
      |  FROM documents
      |  QUALIFY rank <= 15
      |), weighted AS (
      |  SELECT doc_id, source, rank,
      |    500 + (${rollingHashSql("source")} % 1500 + 1500) % 1500 AS weight
      |  FROM ranked
      |), vts AS (
      |  SELECT doc_id, source, rank, weight,
      |    (rank * 1000000000) // weight AS vt
      |  FROM weighted
      |)
      |SELECT ROW_NUMBER() OVER (ORDER BY vt, source, rank) AS position,
      |  source, doc_id, rank, weight, vt
      |FROM vts
      |QUALIFY position <= 100
      |ORDER BY position""".stripMargin

  val sampleMixturePlanSql: String =
    s"""WITH by_source AS (
      |  SELECT source, COUNT(*) AS available,
      |    500 + (${rollingHashSql("source")} % 1500 + 1500) % 1500 AS weight
      |  FROM documents GROUP BY 1
      |), tot AS (SELECT CAST(SUM(weight) AS BIGINT) AS wsum FROM by_source)
      |SELECT source, available, weight,
      |  (weight * 400) // wsum AS target_docs,
      |  least((weight * 400) // wsum, available) AS allocated,
      |  (weight * 400) // wsum - least((weight * 400) // wsum, available)
      |    AS deficit,
      |  CAST(least((weight * 400) // wsum, available) AS DOUBLE) /
      |    CAST((weight * 400) // wsum AS DOUBLE) AS fill_rate
      |FROM by_source, tot
      |ORDER BY source""".stripMargin

  /** text_char_entropy — per-language character-unigram entropy of the
    * normalized text, in millinats: the cheapest corpus-integrity
    * signal there is. Mojibake, base64 blobs, and wrong-language
    * contamination all move H(char) before any tokenizer runs; each
    * language has a stable band, so the per-lang value is a drift gate.
    * Shape: the char explode is fact×chars rows but the (lang, char)
    * count shuffle is bounded by the alphabet (map-side combine does
    * the heavy lifting); entropy uses the millinat-quantized ln
    * discipline (Σ n·ln n exact BIGINT, H = ln N − Σ/N, non-negative
    * integer DIV). Alphabet size and the modal character ride along. */
  def textCharEntropy(spark: SparkSession, dir: String): DataFrame = {
    val lnq = (c: Column) => floor(log(c.cast("double")) * 1000d + 0.5d).cast("long")
    Tables.documents(spark, dir)
      .select(col("lang"), explode(split(normText(col("text")), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("lang"), col("ch"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("lang"))
      .agg(sum(col("n")).as("n_chars"),
        count(lit(1)).as("alphabet_size"),
        sum(col("n") * lnq(col("n"))).as("sum_nlnn_mn"),
        max(struct(col("n"), col("ch"))).as("m"))
      .withColumn("entropy_mn",
        lnq(col("n_chars")) - expr("sum_nlnn_mn DIV n_chars"))
      .select(col("lang"), col("n_chars"), col("alphabet_size"),
        col("sum_nlnn_mn"), col("entropy_mn"),
        col("m.ch").as("top_char"), col("m.n").as("top_char_n"))
      .orderBy(col("lang"))
  }

  val textCharEntropySql: String =
    s"""WITH chars AS (
      |  SELECT lang, unnest(string_split(${normTextSql("text")}, '')) AS ch
      |  FROM documents
      |), counts AS (
      |  SELECT lang, ch, COUNT(*) AS n FROM chars WHERE ch <> '' GROUP BY 1, 2
      |), rolled AS (
      |  SELECT lang,
      |    CAST(SUM(n) AS BIGINT) AS n_chars,
      |    COUNT(*) AS alphabet_size,
      |    CAST(SUM(n * CAST(FLOOR(ln(CAST(n AS DOUBLE)) * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_nlnn_mn
      |  FROM counts GROUP BY lang
      |), top AS (
      |  SELECT lang, ch AS top_char, n AS top_char_n,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, ch DESC) AS rn
      |  FROM counts
      |)
      |SELECT r.lang, r.n_chars, r.alphabet_size, r.sum_nlnn_mn,
      |  CAST(CAST(FLOOR(ln(CAST(r.n_chars AS DOUBLE)) * 1000 + 0.5) AS BIGINT)
      |    - (r.sum_nlnn_mn // r.n_chars) AS BIGINT) AS entropy_mn,
      |  t.top_char, CAST(t.top_char_n AS BIGINT) AS top_char_n
      |FROM rolled r JOIN top t ON r.lang = t.lang AND t.rn = 1
      |ORDER BY r.lang""".stripMargin

  /** text_length_outliers — robust per-source length-outlier census:
    * median/MAD of doc char lengths (exact percentile on the integral
    * n_chars column — the stats_mad discipline on the corpus), docs
    * beyond 5×MAD flagged with a basis-point rate. Truncated scrapes,
    * concatenation bugs, and boilerplate explosions all surface here
    * before they skew token budgets; MAD (not σ) so the outliers being
    * hunted can't inflate the fence that should catch them. Two
    * scalar-per-source broadcasts, no window. */
  def textLengthOutliers(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("source"), col("n_chars"))
    val med = d.groupBy(col("source"))
      .agg(expr("percentile(n_chars, 0.5d)").as("med"))
    val dev = d.join(broadcast(med), Seq("source"))
      .withColumn("ad", abs(col("n_chars").cast("double") - col("med")))
    val mad = dev.groupBy(col("source"))
      .agg(expr("percentile(ad, 0.5d)").as("mad"))
    dev.join(broadcast(mad), Seq("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("med")).as("median_chars"),
        max(col("mad")).as("mad_chars"),
        sum(when(col("ad") > lit(5d) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .withColumn("outlier_bp",
        expr("(n_outliers * 10000L) DIV greatest(n_docs, 1L)"))
      .orderBy(col("source"))
  }

  val textLengthOutliersSql: String =
    """WITH d AS (
      |  SELECT source, n_chars FROM documents
      |), med AS (
      |  SELECT source, quantile_cont(n_chars, 0.5) AS med FROM d GROUP BY source
      |), dev AS (
      |  SELECT d.source, d.n_chars, med.med,
      |    abs(CAST(d.n_chars AS DOUBLE) - med.med) AS ad
      |  FROM d JOIN med USING (source)
      |), mad AS (
      |  SELECT source, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY source
      |)
      |SELECT v.source, COUNT(*) AS n_docs,
      |  MAX(v.med) AS median_chars, MAX(m.mad) AS mad_chars,
      |  CAST(SUM(CASE WHEN v.ad > 5 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  CAST((CAST(SUM(CASE WHEN v.ad > 5 * m.mad THEN 1 ELSE 0 END) AS BIGINT) * 10000)
      |    // GREATEST(COUNT(*), 1) AS BIGINT) AS outlier_bp
      |FROM dev v JOIN mad m USING (source)
      |GROUP BY v.source
      |ORDER BY source""".stripMargin

  /** text_pack_boundaries — concat-and-chunk packing audit: when a
    * loader concatenates each source's docs (doc_id order) and chunks
    * the stream into 2048-token contexts, which docs STRADDLE a context
    * boundary? Straddlers are split across training examples (partial
    * cross-doc attention, truncated continuations) — this census is the
    * argument for/against doc-boundary-respecting packing per source.
    * Cumulative tokens via Prefix.runningSum (cluster-scaled slices, no
    * single-partition window); a doc straddles iff its [start, end)
    * token span crosses a 2048 multiple, i.e. start DIV W <
    * (end−1) DIV W. All-integer carriers; contexts = ⌈Σtokens/W⌉;
    * output is sources-sized. */
  def textPackBoundaries(spark: SparkSession, dir: String): DataFrame = {
    val W = 2048L
    val toks = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        size(words(col("text"))).cast("long").as("t"))
    Prefix.runningSum(toks, Seq("source"), Seq(col("doc_id")), col("t"), "cum")
      .withColumn("tok0", col("cum") - col("t"))
      .withColumn("straddles",
        when(expr(s"(tok0 DIV $W) < ((cum - 1L) DIV $W)"), 1L).otherwise(0L))
      // greatest(…, 0): a zero-token doc whose start sits exactly on a
      // boundary would otherwise evaluate to -1 crossings.
      .withColumn("crossings",
        expr(s"greatest(((cum - 1L) DIV $W) - (tok0 DIV $W), 0L)"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("t")).as("n_tokens"),
        sum(col("straddles")).as("straddling_docs"),
        sum(col("crossings")).as("boundary_crossings"),
        max(col("cum")).as("_max_cum"))
      .withColumn("n_contexts", expr(s"(_max_cum + ${W - 1L}) DIV $W"))
      .withColumn("straddle_bp",
        expr("(straddling_docs * 10000L) DIV greatest(n_docs, 1L)"))
      .drop("_max_cum")
      .orderBy(col("source"))
  }

  val textPackBoundariesSql: String =
    s"""WITH b AS (
      |  SELECT source, doc_id, CAST(len(${wordsSql("text")}) AS BIGINT) AS t
      |  FROM documents
      |), c AS (
      |  SELECT source, doc_id, t,
      |    SUM(t) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM b
      |), d AS (
      |  SELECT source, t, cum, cum - t AS start,
      |    CASE WHEN ((cum - t) // 2048) < ((cum - 1) // 2048)
      |         THEN 1 ELSE 0 END AS straddles,
      |    GREATEST(((cum - 1) // 2048) - ((cum - t) // 2048), 0) AS crossings
      |  FROM c
      |)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(t) AS BIGINT) AS n_tokens,
      |  CAST(SUM(straddles) AS BIGINT) AS straddling_docs,
      |  CAST(SUM(crossings) AS BIGINT) AS boundary_crossings,
      |  CAST((MAX(cum) + 2047) // 2048 AS BIGINT) AS n_contexts,
      |  CAST((CAST(SUM(straddles) AS BIGINT) * 10000)
      |    // GREATEST(COUNT(*), 1) AS BIGINT) AS straddle_bp
      |FROM d
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** text_context_truncation — context-window truncation audit: per
    * (source, window ∈ {512, 2048, 8192} tokens), how many docs exceed
    * the window and how many tokens fall off the end — the loss a
    * fixed-context trainer eats per source, and the signal for choosing
    * a packing/chunking strategy instead. Token counts use the
    * whitespace discipline of `text_tokens`; sums are exact BIGINTs and
    * the basis-point loss share divides non-negative integers (DIV
    * agrees across engines). Scale shape: the ×3 window explode carries
    * only (source, toks, win) — bytes/row, never text — into one
    * map-combined aggregation; output is sources × 3 rows. */
  def textContextTruncation(spark: SparkSession, dir: String): DataFrame = {
    val wins = Seq(512L, 2048L, 8192L)
    Tables.documents(spark, dir)
      .select(col("source"), size(words(col("text"))).cast("long").as("toks"))
      .withColumn("win", explode(array(wins.map(lit): _*)))
      .groupBy(col("source"), col("win"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("toks") > col("win"), 1L).otherwise(0L)).as("docs_truncated"),
        sum(col("toks")).as("tokens_total"),
        sum(greatest(col("toks") - col("win"), lit(0L))).as("tokens_lost"))
      .withColumn("lost_bp",
        expr("(tokens_lost * 10000L) DIV greatest(tokens_total, 1L)"))
      .orderBy(col("source"), col("win"))
  }

  val textContextTruncationSql: String =
    s"""SELECT source, win,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN toks > win THEN 1 ELSE 0 END) AS BIGINT) AS docs_truncated,
      |  CAST(SUM(toks) AS BIGINT) AS tokens_total,
      |  CAST(SUM(GREATEST(toks - win, 0)) AS BIGINT) AS tokens_lost,
      |  CAST((CAST(SUM(GREATEST(toks - win, 0)) AS BIGINT) * 10000)
      |    // GREATEST(CAST(SUM(toks) AS BIGINT), 1) AS BIGINT) AS lost_bp
      |FROM (SELECT source, CAST(len(${wordsSql("text")}) AS BIGINT) AS toks
      |      FROM documents)
      |CROSS JOIN (SELECT CAST(UNNEST([512, 2048, 8192]) AS BIGINT) AS win)
      |GROUP BY source, win
      |ORDER BY source, win""".stripMargin

  /** Context-chunk geometry for [[textChunks]]: a RAG / long-context
    * prep step slices each doc's token stream into fixed windows with
    * a fixed overlap — chunk k covers token span
    * [k·stride, k·stride + ChunkTokens). */
  val ChunkTokens = 256L
  val ChunkStride = 224L // overlap = ChunkTokens - ChunkStride = 32 tokens

  /** Per-doc ROW-LOCAL chunk derivation: every chunk row (index, span,
    * position-weighted fingerprint Σ polyhash(wᵢ)·(i−start+1) mod P) is
    * computed inside the document's own row — token hashes once via one
    * kernel-mapped transform, then a per-chunk integer fold over the
    * chunk's span. Zero shuffle, zero aggregation state: the natural
    * formulation for BOTH the batch table and the ingest stream.
    *
    * This replaced an explode + groupBy formulation that shuffled every
    * (token, chunk) assignment — measured at sf10: 12.3 s vs 2.1 s for
    * this fold (the 300M-row token shuffle was the entire cost; each
    * doc already HELD its tokens row-locally). The oracle deliberately
    * keeps the explode + re-collect formulation in DuckDB, so the two
    * engines now cross-check two genuinely different algorithms. */
  def chunkRowsOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftvec.VectorExpressions.polyHash
    val S = ChunkStride
    val W = ChunkTokens
    docs
      .withColumn("hs", transform(words(col("text")), w => polyHash(w)))
      .withColumn("n", size(col("hs")).cast("long"))
      .select(col("doc_id"), col("n"), col("hs"),
        explode(expr(s"sequence(0L, (n - 1L) DIV $S)")).as("chunk_idx"))
      .withColumn("tok_start", col("chunk_idx") * S)
      .withColumn("n_toks", least(lit(W), col("n") - col("tok_start")))
      .withColumn("chunk_fp", expr(
        s"""aggregate(sequence(tok_start, tok_start + n_toks - 1L), 0L,
           |  (acc, p) -> acc + element_at(hs, CAST(p + 1L AS INT)) * (p - tok_start + 1L))
           |  % 1000000007L""".stripMargin))
      .select(col("doc_id"), col("chunk_idx"), col("tok_start"),
        col("n_toks"), col("chunk_fp"))
  }

  /** text_chunks — the chunk TABLE a retrieval / long-context pipeline
    * materializes from the corpus: each doc's token stream sliced into
    * [[ChunkTokens]]-token windows every [[ChunkStride]] tokens (32-token
    * overlap, the RAG chunking default shape), one output row per chunk
    * with an exact position-weighted content fingerprint. Row-local
    * derivation ([[chunkRowsOf]]) — the only exchange in the plan is the
    * presentation sort. Output ∝ tokens / stride. */
  def textChunks(spark: SparkSession, dir: String): DataFrame =
    chunkRowsOf(Tables.documents(spark, dir))
      .orderBy(col("doc_id"), col("chunk_idx"))

  val textChunksSql: String = {
    val S = ChunkStride
    val ov = ChunkTokens - ChunkStride
    val baseHash = graft.operators.Dedup.baseHashSql
    s"""WITH toks AS (
      |  SELECT doc_id, ${wordsSql("text")} AS ws FROM documents
      |), psh AS (
      |  SELECT doc_id, i - 1 AS p, ${baseHash.format("ws[i]")} AS h
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i)
      |), a AS (
      |  SELECT doc_id, p, h, p // $S AS k FROM psh
      |  UNION ALL
      |  SELECT doc_id, p, h, p // $S - 1 AS k FROM psh
      |  WHERE p // $S >= 1 AND p % $S < $ov
      |)
      |SELECT doc_id, k AS chunk_idx, k * $S AS tok_start,
      |  COUNT(*) AS n_toks,
      |  CAST(SUM(h * (p - k * $S + 1)) % 1000000007 AS BIGINT) AS chunk_fp
      |FROM a GROUP BY doc_id, k
      |ORDER BY doc_id, chunk_idx""".stripMargin
  }

  /** Token-budget multiplier for [[sampleEpochPlan]]: the planned run
    * consumes 4× the corpus's unique token mass, so weight-favored
    * sources must repeat (epochs > 1) while down-weighted ones
    * undershoot — both regimes exercised at every SF. */
  val EpochBudgetX = 4L

  /** sample_epoch_plan — data-constrained repetition planning (the
    * Muennighoff-et-al "scaling data-constrained LMs" question): given
    * a token budget of [[EpochBudgetX]]× the corpus and the family's
    * deterministic per-source mixture weights (sample_mixture_plan's
    * convention), how many FULL epochs does each source repeat, how
    * many tokens of the final partial epoch are read, and what is the
    * repeat ratio? repeat_bp > 10000 is the multi-epoch regime where
    * repeated-token decay sets in — the planner's signal to either
    * re-weight or go find more data. All-integer arithmetic
    * (weight·budget DIV Σw; DIV/MOD on exact token counts), so the
    * plan is bit-reproducible.
    *
    * Scale shape: one map-side token count per doc, a sources-sized
    * rollup, one broadcast scalar — the plan costs one corpus scan. */
  def sampleEpochPlan(spark: SparkSession, dir: String): DataFrame = {
    val bySource = Tables.documents(spark, dir)
      .select(col("source"), size(words(col("text"))).cast("long").as("t"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("unique_tokens"))
      .withColumn("weight",
        lit(500L) + pmod(rollingHash(col("source")), lit(1500L)))
    bySource
      .crossJoin(broadcast(bySource.agg(sum(col("weight")).as("wsum"),
        (sum(col("unique_tokens")) * EpochBudgetX).as("budget"))))
      .withColumn("target_tokens", expr("(weight * budget) DIV wsum"))
      .withColumn("full_epochs", expr("target_tokens DIV greatest(unique_tokens, 1L)"))
      .withColumn("partial_tokens", expr("target_tokens % greatest(unique_tokens, 1L)"))
      .withColumn("repeat_bp",
        expr("(target_tokens * 10000L) DIV greatest(unique_tokens, 1L)"))
      .select(col("source"), col("n_docs"), col("unique_tokens"), col("weight"),
        col("target_tokens"), col("full_epochs"), col("partial_tokens"),
        col("repeat_bp"))
      .orderBy(col("source"))
  }

  val sampleEpochPlanSql: String = {
    val srcHash = rollingHashSql("source")
    s"""WITH bysrc AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(${wordsSql("text")})) AS BIGINT) AS unique_tokens,
      |    500 + (($srcHash) % 1500 + 1500) % 1500 AS weight
      |  FROM documents GROUP BY source
      |), tot AS (
      |  SELECT CAST(SUM(weight) AS BIGINT) AS wsum,
      |    CAST(SUM(unique_tokens) * $EpochBudgetX AS BIGINT) AS budget
      |  FROM bysrc
      |), p AS (
      |  SELECT source, n_docs, unique_tokens, weight,
      |    (weight * (SELECT budget FROM tot)) // (SELECT wsum FROM tot) AS target_tokens
      |  FROM bysrc
      |)
      |SELECT source, n_docs, unique_tokens, CAST(weight AS BIGINT) AS weight,
      |  CAST(target_tokens AS BIGINT) AS target_tokens,
      |  CAST(target_tokens // GREATEST(unique_tokens, 1) AS BIGINT) AS full_epochs,
      |  CAST(target_tokens % GREATEST(unique_tokens, 1) AS BIGINT) AS partial_tokens,
      |  CAST((target_tokens * 10000) // GREATEST(unique_tokens, 1) AS BIGINT) AS repeat_bp
      |FROM p
      |ORDER BY source""".stripMargin
  }

  /** Winnowing geometry for [[textWinnowFp]] (Schleimer-Wilkerson-Aiken
    * local fingerprinting): k-gram size and selection-window width. Any
    * shared substring of at least WinnowK + WinnowW − 1 = 12 words is
    * GUARANTEED to contribute at least one common fingerprint — the
    * winnowing correctness property. */
  val WinnowK = 5
  val WinnowW = 8

  /** text_winnow_fp — per-document winnowing fingerprints, the
    * plagiarism/MOSS-style LOCAL document signature: positional
    * [[WinnowK]]-gram polyhashes, then the minimum hash of each
    * [[WinnowW]]-wide sliding window is selected, and the doc's
    * fingerprint set is the distinct selected values. Unlike the global
    * MinHash sketch (dedup_minhash), winnowing is position-local: two
    * docs sharing ANY ≥ 12-word substring must share a fingerprint, so
    * the fingerprint index supports partial-overlap retrieval, not just
    * whole-doc near-dup. Output is the per-doc census (gram/window/
    * fingerprint counts + an order-independent set digest); the
    * fingerprint INDEX itself is the (doc_id, fp) pre-distinct relation
    * this query reduces.
    *
    * Determinism: min-of-window needs no tiebreak (values, not
    * positions, are selected); the set digest is Σ distinct fp mod P —
    * exact in int64 (each fp < 2³⁰; docs hold ≪ 2³⁴ fingerprints).
    *
    * Scale shape: one kernel pass (ShinglesKHashedSeq), one per-doc
    * window sorted by position (partition-local after the doc_id
    * shuffle), one per-doc rollup. Output ∝ docs. */
  def textWinnowFp(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    Tables.documents(spark, dir)
      .withColumn("ws", words(col("text")))
      .select(col("doc_id"),
        posexplode(shinglesKHashedSeqFromWords(col("ws"), WinnowK))
          .as(Seq("pos", "h")))
      .withColumn("pos", col("pos").cast("long"))
      .withColumn("mn", min(col("h")).over(w.rowsBetween(0, WinnowW - 1)))
      .withColumn("n_grams", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      // only FULL windows select (the trailing < WinnowW grams are
      // covered by earlier windows; a doc with < WinnowW grams emits none)
      .filter(col("pos") <= col("n_grams") - WinnowW.toLong)
      .groupBy(col("doc_id"))
      .agg(max(col("n_grams")).as("n_grams"),
        count(lit(1)).as("n_windows"),
        countDistinct(col("mn")).as("n_fps"),
        (sum_distinct(col("mn")) % 1000000007L).as("fp_digest"),
        min(col("mn")).as("fp_min"))
      .orderBy(col("doc_id"))
  }

  val textWinnowFpSql: String = {
    val k = WinnowK
    val win = (0 until k).map(j => s"ws[i+$j]").mkString(" || '_' || ")
    val baseHash = graft.operators.Dedup.baseHashSql
    s"""WITH toks AS (
      |  SELECT doc_id, ${wordsSql("text")} AS ws FROM documents
      |), psh AS (
      |  SELECT doc_id, i - 1 AS pos, ${baseHash.format(win)} AS h
      |  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(ws) - $k + 2, 1))) AS i)
      |  WHERE len(ws) >= $k
      |), sel AS (
      |  SELECT doc_id, pos,
      |    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS mn,
      |    COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
      |  FROM psh
      |)
      |SELECT doc_id, MAX(n_grams) AS n_grams, COUNT(*) AS n_windows,
      |  CAST(COUNT(DISTINCT mn) AS BIGINT) AS n_fps,
      |  CAST(SUM(DISTINCT mn) % 1000000007 AS BIGINT) AS fp_digest,
      |  CAST(MIN(mn) AS BIGINT) AS fp_min
      |FROM sel WHERE pos <= n_grams - $WinnowW
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin
  }

  /** sample_curriculum — curriculum-ordering schedule: docs are ranked
    * easy → hard by an exact integer difficulty proxy (mean word length
    * in millichars — short-word prose reads easier than jargon), split
    * into 10 value-banded phases at the corpus's difficulty deciles, and
    * the schedule reports each phase's doc/token mass. The curriculum
    * consumer trains phase 1 → 10; the token masses are the phase
    * budget sizes.
    *
    * Scale discipline (the q37 pattern): NO global sort / ntile — the
    * nine decile cuts are one percentile aggregate broadcast back, and
    * every doc finds its phase map-side by counting cuts ≤ its
    * difficulty. Ties at a cut land deterministically in the lower
    * phase on both engines (identical ≤ on identical doubles). */
  def sampleCurriculum(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        size(words(col("text"))).cast("long").as("n_toks"))
      .withColumn("difficulty_mn",
        expr("(n_chars * 1000L) DIV greatest(n_toks, 1L)"))
    val cuts = d.agg(expr(
      "percentile(difficulty_mn, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
      .as("qs"))
    d.crossJoin(broadcast(cuts))
      .withColumn("phase",
        (lit(1) + size(filter(col("qs"),
          c => c < col("difficulty_mn").cast("double")))).cast("long"))
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        min(col("difficulty_mn")).as("difficulty_min"),
        max(col("difficulty_mn")).as("difficulty_max"))
      .orderBy(col("phase"))
  }

  val sampleCurriculumSql: String =
    s"""WITH d AS (
      |  SELECT doc_id, n_chars,
      |    CAST(len(${wordsSql("text")}) AS BIGINT) AS n_toks,
      |    (n_chars * 1000) // GREATEST(CAST(len(${wordsSql("text")}) AS BIGINT), 1)
      |      AS difficulty_mn
      |  FROM documents
      |), cuts AS (
      |  SELECT quantile_cont(difficulty_mn,
      |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs FROM d
      |), b AS (
      |  SELECT n_toks, difficulty_mn,
      |    1 + len(list_filter((SELECT qs FROM cuts),
      |      c -> c < CAST(difficulty_mn AS DOUBLE))) AS phase
      |  FROM d
      |)
      |SELECT CAST(phase AS BIGINT) AS phase, COUNT(*) AS n_docs,
      |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
      |  CAST(MIN(difficulty_mn) AS BIGINT) AS difficulty_min,
      |  CAST(MAX(difficulty_mn) AS BIGINT) AS difficulty_max
      |FROM b GROUP BY phase
      |ORDER BY phase""".stripMargin
}
