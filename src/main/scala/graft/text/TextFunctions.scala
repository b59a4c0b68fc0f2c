package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Text-analysis column functions for the LLM-pipeline extension surface
  * (BASELINE.json north star): tokenization, language-ID heuristic, quality
  * scoring, shingling, and a rolling-hash document fingerprint.
  *
  * Everything here is pure `org.apache.spark.sql.functions` composition
  * (codegen/vectorization-friendly, no UDFs), and every primitive is chosen
  * to be reproducible in DuckDB SQL so the operators stay oracle-checkable:
  * e.g. the fingerprint is a polynomial fold over code points rather than a
  * murmur/xxhash whose implementation differs across engines.
  */
object TextFunctions {

  /** Modulus for polynomial hashing: fits products in a signed 64-bit long
    * ((P-1)*131 + 65535 << 2^63).
    */
  val PolyMod = 1000000007L
  val PolyMul = 131L

  /** Independent second hash member (see [[graft.functions.PolyHash.base2]]):
    * combined as `h1·PolyMod2 + h2` a bucket key spans ~59 bits, pushing
    * birthday collisions from the ~10^5-key horizon of a single 30-bit hash
    * out to ~10^9 keys — required for bucket-equality dedup at corpus scale.
    */
  val PolyMod2 = 998244353L
  val PolyMul2 = 137L

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Lower-cased Unicode word tokens: maximal letter/digit runs
    * (`[\p{L}\p{N}]+`), so punctuation-glued words ("end.", "foo,bar") and
    * non-Latin scripts tokenize sanely. The class syntax is shared by Java
    * regex (Spark) and RE2 (DuckDB `regexp_extract_all`), keeping the op
    * oracle-comparable. Opt-in via `tokenMode = "unicode"` on the ops that
    * thread a tokenizer; the whitespace [[tokens]] stays the default.
    */
  def tokensUnicode(text: Column): Column =
    regexp_extract_all(lower(text), lit("[\\p{L}\\p{N}]+"), lit(0))

  /** Tokenizer selector threaded through token-parameterized ops:
    * "ws" (default, [[tokens]]) or "unicode" ([[tokensUnicode]]).
    */
  def tokenizerFor(mode: String): Column => Column = mode match {
    case "ws" => tokens
    case "unicode" => tokensUnicode
    case other => throw new IllegalArgumentException(
      s"unknown tokenMode '$other' (expected 'ws' or 'unicode')")
  }

  /** Case-preserving whitespace tokens. */
  def rawTokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(rawTokens(text))

  /** Distinct word n-gram shingles (standard MinHash preprocessing),
    * computed by the one-pass [[graft.functions.WordShingles]] kernel —
    * identical to `array_distinct(transform(sequence(...), i ->
    * concat_ws(' ', slice(tokens, i, n))))` over [[tokens]].
    */
  def wordShingles(text: Column, n: Int, unicode: Boolean = false): Column =
    graft.functions.exprs.wordShingles(text, n, unicode)

  /** Code points of a string, '(?s).' so newlines are kept. Assumes BMP text
    * (Spark `ascii` returns the UTF-16 unit, == code point within the BMP,
    * matching DuckDB `unicode`).
    */
  private def codePoints(s: Column): Column =
    transform(regexp_extract_all(s, lit("(?s)."), lit(0)), ch => ascii(ch).cast("long"))

  /** Seeded polynomial rolling hash over code points:
    * fold(seed+1, c => (acc*131 + c) mod P). DuckDB equivalent:
    * list_reduce(list_prepend(seed+1, codes), (a,b) -> (a*131+b) % P).
    */
  def polyHash(s: Column, seed: Column): Column =
    aggregate(
      codePoints(s),
      (seed + lit(1L)).cast("long"),
      (acc, c) => (acc * lit(PolyMul) + c) % lit(PolyMod)
    )

  /** Whole-document fingerprint (SURVEY north-star "document
    * fingerprinting"): order-sensitive rolling hash of the raw text.
    * Computed via the codegen'd kernels using the factorization
    * polyHash(s, 0) = (131^len(s) + polyBase(s)) mod P — bit-identical to
    * the interpreted fold (and to the DuckDB oracle's list_reduce).
    */
  def fingerprint(text: Column): Column =
    (graft.functions.exprs.polyPow(text) + graft.functions.exprs.polyBase(text)) %
      lit(PolyMod)

  // ---- language identification (n-gram/stopword heuristic) ---------------

  /** Distinctive stopword markers per language; zh is detected by CJK
    * code-point count. Kept small and disjoint so the DuckDB oracle regex
    * stays identical.
    */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|is|was|that|with)\\b",
    "de" -> "\\b(und|ist|nicht|der|das|ein)\\b",
    "fr" -> "\\b(est|les|dans|que|pour|avec)\\b",
    "es" -> "\\b(es|los|las|para|como|pero)\\b"
  )
  val CjkPattern = "[\\x{4e00}-\\x{9fff}]"

  def langScore(text: Column, lang: String): Column = lang match {
    case "zh" => regexp_count(text, lit(CjkPattern))
    case l =>
      val pat = LangMarkers.toMap.apply(l)
      regexp_count(lower(text), lit(pat))
  }

  /** Deterministic arg-max with fixed precedence zh > en > de > fr > es
    * (any CJK content wins outright; ties resolve in precedence order) —
    * the same CASE chain is expressible in ANSI SQL.
    */
  def langId(text: Column): Column = {
    val en = langScore(text, "en"); val de = langScore(text, "de")
    val fr = langScore(text, "fr"); val es = langScore(text, "es")
    val zh = langScore(text, "zh")
    when(zh > 0, "zh")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  // ---- C4 line-level cleaning (Raffel et al. 2020 §2.2) -------------------

  /** Newline-split lines of a document. */
  def docLines(text: Column): Column = split(text, "\n")

  /** C4's per-line retention rules: keep a line only if it (1) ends in a
    * terminal punctuation mark (`. ! ? "`), (2) contains at least five
    * words, and (3) does not mention "javascript" (the cookie/JS-warning
    * boilerplate heuristic). Pure string/integer predicates inside one
    * higher-order `filter` — no UDF, and a SQL engine reproduces the kept
    * set exactly.
    */
  def c4KeptLines(text: Column): Column =
    filter(docLines(text), l =>
      size(split(trim(l), "\\s+")) >= 5 &&
        right(trim(l), lit(1)).isin(".", "!", "?", "\"") &&
        !lower(l).contains("javascript"))

  /** C4's document-level rules over the kept lines: at least three retained
    * lines, no "lorem ipsum" placeholder text, no curly brace (code
    * leakage). 1 = keep.
    */
  def c4Keep(text: Column): Column =
    (size(c4KeptLines(text)) >= 3 &&
      !lower(text).contains("lorem ipsum") &&
      !text.contains("{")).cast("int")

  // ---- quality scoring ----------------------------------------------------

  def alphaCount(text: Column): Column = regexp_count(text, lit("[A-Za-z]"))
  def digitCount(text: Column): Column = regexp_count(text, lit("[0-9]"))
  def punctCount(text: Column): Column = regexp_count(text, lit("[.,;:!?]"))

  /** Heuristic document quality in [0,1]: token-count saturation + alphabetic
    * density + punctuation sanity. The exact expression tree (parenthesized
    * identically in the oracle) makes the double bit-reproducible.
    */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val nt = tokenCount(text).cast("double")
    least(nt / lit(100.0), lit(1.0)) * lit(0.5) +
      (alphaCount(text).cast("double") / len) * lit(0.3) +
      (lit(1.0) - punctCount(text).cast("double") / len) * lit(0.2)
  }
}
