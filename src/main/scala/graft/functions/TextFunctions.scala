package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis primitives for large-scale training-data pipelines:
  * shingling, token counting, quality scoring, language-ID heuristics,
  * deterministic document fingerprints.
  *
  * Everything is built from codegen'd Spark SQL functions (`transform`,
  * `aggregate`, `regexp_*`) — no UDFs — so the hot path stays inside
  * whole-stage codegen and the same semantics are expressible in ANSI SQL
  * for the oracle.
  */
object TextFunctions {

  /** Distinct character k-shingles of a string (order-free set); text
    * shorter than k has no k-shingle → empty array. Computed by the
    * one-pass codegen'd [[CharShingles]] kernel — the
    * `transform(sequence, substring)` formulation is O(n²) per document
    * because SQL `substring` re-scans for the UTF-8 char offset on every
    * call. Output set and order are identical to the HOF form (and to the
    * SQL twin's `list_distinct` comprehension).
    */
  def shingles(text: Column, k: Int = 5): Column =
    CharShingles(text, k)

  /** SQL twin of [[shingles]] (DuckDB list comprehension). */
  def shinglesSql(text: String, k: Int = 5): String =
    s"list_distinct([substring($text, i, $k) for i in generate_series(1, length($text) - ${k - 1})])"

  /** Exact Jaccard similarity of two string-array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(filter(split(trim(text), "\\s+"), t => length(t) > 0))

  /** BPE-ish subword token count: word pieces + standalone punctuation
    * (`\w+` runs and single non-space symbols), the usual pre-tokenizer
    * approximation when no vocab is available.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit(SubwordRe), lit(0)))

  /** BPE-ish subword pre-tokenizer pattern (see [[subwordCount]]) —
    * shared by the hashed-feature scorer so model features and token
    * stats can't drift apart.
    */
  val SubwordRe = "[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"

  /** Hashed-feature linear model logit — the fasttext-shaped quality
    * classifier applied the way a 100 TB curation run applies one:
    * hashing-trick featurization (md5 → bucket) and a per-bucket weight
    * table, evaluated as array HOFs entirely INSIDE the row — no
    * explode, no shuffle, whole-stage codegen; scoring cost is the scan.
    * The stand-in weight table is arithmetic
    * (`w(h) = (h·2654435761 mod 2048) − 1024`, Knuth-multiplier spread)
    * so the oracle replicates it verbatim; a trained model swaps in a
    * broadcast weight array without touching the plan. All-integer →
    * bit-exact on any engine. NULL text scores 0 (null-coalesced on
    * BOTH engines — a NULL-in/NULL-out Spark side against the twin's
    * summed-NULL→0 COALESCE would diverge the moment a nullable source
    * feeds it).
    */
  def hashedLinearLogit(text: Column, buckets: Int = 1024): Column =
    aggregate(
      transform(
        regexp_extract_all(coalesce(text, lit("")), lit(SubwordRe), lit(0)),
        t => ((conv(substring(md5(t), 1, 4), 16, 10).cast("long") % buckets)
          * 2654435761L % 2048L) - 1024L),
      lit(0L),
      (acc, w) => acc + w)

  /** SQL twin of [[hashedLinearLogit]] for DuckDB (empty list sums to
    * NULL there, hence the COALESCE; the regex interpolates [[SubwordRe]]
    * so the twin cannot drift from the Spark features).
    */
  def hashedLinearLogitSql(expr: String, buckets: Int = 1024): String =
    s"CAST(COALESCE(list_aggregate(list_transform(" +
      s"regexp_extract_all(COALESCE($expr, ''), '$SubwordRe'), " +
      s"t -> ((CAST(('0x' || substring(md5(t), 1, 4)) AS BIGINT) % $buckets) " +
      s"* 2654435761 % 2048) - 1024), 'sum'), 0) AS BIGINT)"

  /** Punctuation character ratio ∈ [0,1]. */
  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0))).cast(DoubleType) /
      greatest(length(text), lit(1)).cast(DoubleType)

  /** Ratio of tokens that are stopwords, given a lexicon. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)
    val hits = size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
    hits.cast(DoubleType) / greatest(size(toks), lit(1)).cast(DoubleType)
  }

  /** Occurrences of a marker word, whole-token, in lowered text. */
  def markerCount(text: Column, marker: String): Column =
    size(regexp_extract_all(lower(text), lit(s"\\b$marker\\b"), lit(0)))

  /** Language-ID by stopword-marker voting: the language whose marker
    * lexicon hits most tokens wins; deterministic tie order = argument
    * order. A classic cheap n-gram/stopword heuristic — not a model.
    */
  def languageId(text: Column, lexicons: Seq[(String, Seq[String])]): Column = {
    val scores = lexicons.map { case (lang, markers) =>
      (lang, markers.map(m => markerCount(text, m)).reduce(_ + _))
    }
    // argmax with first-wins tie order
    scores.tail.foldLeft((scores.head._2, lit(scores.head._1))) {
      case ((bestScore, bestLang), (lang, score)) =>
        (when(score > bestScore, score).otherwise(bestScore),
          when(score > bestScore, lit(lang)).otherwise(bestLang))
    }._2
  }

  /** Word n-grams over whitespace tokens of the lowered text: the LM-side
    * corpus statistic (n-gram frequency tables, contamination checks).
    * Texts with fewer than n tokens yield an empty array. One generator +
    * `element_at` reads per position — no per-gram re-tokenization.
    */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    val toks = filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)
    // Bind the token array ONCE as a lambda variable: every element_at
    // below then reads a bound attribute. Referencing `toks` directly from
    // each element_at would re-run split+filter per read — O(tokens²) per
    // document, which showed up as a 10× slowdown on real corpora.
    element_at(
      transform(array(toks), ts =>
        when(size(ts) >= n,
          transform(sequence(lit(1), size(ts) - (n - 1)),
            i => concat_ws(" ", (0 until n).map(j => element_at(ts, i + lit(j))): _*)))
          .otherwise(typedlit(Seq.empty[String]))),
      1)
  }

  /** SQL twin of [[wordNgrams]] for DuckDB (list slicing is 1-based and
    * end-inclusive, so `t[i:i+n-1]` is exactly n tokens). The coalesce
    * matches Spark's NULL behavior: [[wordNgrams]] lands in its
    * `.otherwise` (empty array) for NULL text, while the bare DuckDB
    * comprehension would propagate NULL.
    */
  def wordNgramsSql(text: String, n: Int): String = {
    val toks = s"list_filter(string_split_regex(lower(trim($text)), '\\s+'), x -> length(x) > 0)"
    s"coalesce([array_to_string(($toks)[i:i+${n - 1}], ' ') " +
      s"for i in generate_series(1, len($toks) - ${n - 1})], [])"
  }

  /** PII patterns — deliberately restricted to syntax shared by Java's
    * regex engine (Spark) and RE2 (DuckDB and most scan-side filter
    * pushdowns): character classes, bounded repetition, `\b` / `\d`; no
    * backreferences or lookaround. Redaction order is pinned at email →
    * IPv4 → phone and IS load-bearing for adversarial spans that match
    * more than one pattern (`555-1234@x.com`: the email mask wins whole;
    * phone-first would leave `<PHONE>@x.com`). [[piiCount]] counts each
    * pattern independently over the UNredacted text, so per-type counts
    * need not reconcile with the masks on such overlaps — counts answer
    * "how many spans LOOK like X", the masks answer "what did redaction
    * do", in this fixed order.
    */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe: String = "\\b\\d{3}-\\d{4}\\b"

  /** Redact emails / IPv4 addresses / phone-style numbers to typed masks.
    * Map-only `regexp_replace` chain — no shuffle at any scale.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** SQL twin of [[redactPii]]. DuckDB's `regexp_replace` replaces only
    * the FIRST match without the 'g' flag (Spark always replaces all), so
    * the flag is load-bearing.
    */
  def redactPiiSql(expr: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($expr, " +
      s"'$EmailRe', '<EMAIL>', 'g'), '$Ipv4Re', '<IP>', 'g'), '$PhoneRe', '<PHONE>', 'g')"

  /** Count of matches of a PII pattern (group 0) in `text`. */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Deterministic polynomial rolling hash over characters, mod 1e9+7 —
    * a cross-engine-stable document fingerprint (unlike xxhash64, the
    * arithmetic is plain SQL on both sides; values stay < 2^35, no
    * overflow).
    */
  def fingerprint(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch)) % 1000000007L)

  /** SQL twin of [[fingerprint]] for DuckDB. */
  def fingerprintSql(text: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"[CAST(ord(ch) AS BIGINT) for ch in string_split($text, '')]), " +
      s"(acc, c) -> (acc * 31 + c) % 1000000007)"
}
