package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives as pure Column expressions (SURVEY.md §2.D).
  *
  * Everything here is built from `org.apache.spark.sql.functions` (all
  * codegen'd — no Scala UDFs), so the operators composed from these stay
  * inside whole-stage codegen and Catalyst can prune/push around them.
  * Each primitive has an exactly-equivalent DuckDB SQL form used by the
  * oracle queries (TextAnalysis/Dedup).
  */
object TextFunctions {

  /** Normalized text: lowercase, trimmed, single-spaced. */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Whitespace tokens of normalized text. */
  def words(c: Column): Column = split(normText(c), " ")

  /** Count of tokens from `c` that appear in `markers` (language marker /
    * stopword hits). Backed by the native MarkerHits kernel: the
    * equivalent `size(filter(words(c), isin))` HOF evaluates interpreted
    * AND re-splits the text per call (no CSE across HOF lambdas). */
  def markerHits(c: Column, markers: Seq[String]): Column =
    org.apache.spark.sql.graftvec.MarkerHitsExpressions
      .markerHits(words(c), Seq(markers)).getItem(0)

  /** Occurrence counts against K marker sets in one pass over one words
    * array — text_langid probes three language sets per doc. */
  def markerHitsMulti(ws: Column, markerSets: Seq[Seq[String]]): Column =
    org.apache.spark.sql.graftvec.MarkerHitsExpressions.markerHits(ws, markerSets)

  /** Word 3-gram shingles (distinct, first-occurrence order) from a words
    * array column; empty array for texts shorter than 3 words.
    *
    * Backed by the native codegen'd `Shingles3` expression (graftvec):
    * the equivalent higher-order-function form
    * (`array_distinct(transform(sequence(...), i -> concat_ws(...)))`)
    * evaluates interpreted — one lambda dispatch per element with no
    * common-subexpression elimination — while this is one tight kernel
    * call per row inside whole-stage codegen. */
  def shingles3FromWords(ws: Column): Column =
    org.apache.spark.sql.graftvec.StringExpressions.shingles3(ws)

  /** Distinct 3-gram shingles as their portable polyhash longs — the
    * shingle string is never materialized (graftvec.Shingles3Hashed);
    * the join-key form the dedup family consumes. */
  def shingles3HashedFromWords(ws: Column): Column =
    org.apache.spark.sql.graftvec.StringExpressions.shingles3Hashed(ws)

  /** POSITIONAL shingle polyhashes (duplicates kept, start-position
    * order) — posexplode yields the (pos, hash) stream the
    * duplicated-span detector consumes (graftvec.Shingles3HashedSeq). */
  def shingles3HashedSeqFromWords(ws: Column): Column =
    org.apache.spark.sql.graftvec.StringExpressions.shingles3HashedSeq(ws)

  /** Positional k-gram window polyhashes (duplicates kept) — the
    * exact-substring dedup carrier (graftvec.ShinglesKHashedSeq). */
  def shinglesKHashedSeqFromWords(ws: Column, k: Int): Column =
    org.apache.spark.sql.graftvec.StringExpressions.shinglesKHashedSeq(ws, k)

  /** Word 3-gram shingles of normalized text. (With the native
    * expression the words array is evaluated once per row either way —
    * pre-materializing it with withColumn is no longer required.) */
  def shingles3(c: Column): Column = shingles3FromWords(words(c))

  /** Polynomial rolling hash over the characters of normalized text:
    * h = fold(h*31 + ascii(c)) mod 1e9+7. Deterministic and cheap; the
    * DuckDB equivalent is list_reduce over string_split. */
  def rollingHash(c: Column): Column =
    aggregate(
      transform(split(normText(c), ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31L + x) % 1000000007L)

  /** BPE-ish regex token count: alnum runs + isolated non-alnum marks. */
  def regexTokenCount(c: Column): Column =
    size(regexp_extract_all(normText(c), lit("[a-z0-9]+|[^a-z0-9 ]"), lit(0)))

  // SQL fragments (DuckDB) mirroring the primitives above, for oracle use.
  def normTextSql(e: String): String = s"regexp_replace(lower(trim($e)), '\\s+', ' ', 'g')"
  def wordsSql(e: String): String = s"string_split(${normTextSql(e)}, ' ')"
  def rollingHashSql(e: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split(${normTextSql(e)}, ''), c -> ascii(c)::BIGINT)), (a, b) -> (a*31 + b) % 1000000007)"
  def regexTokenCountSql(e: String): String =
    s"len(regexp_extract_all(${normTextSql(e)}, '[a-z0-9]+|[^a-z0-9 ]'))"
}
