package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level text operators (DataFrame → DataFrame): BM25 ranking and
  * corpus-wide boilerplate removal. Both are built so every compared value
  * is exact BIGINT arithmetic (see [[log2e6Sql]]) and therefore
  * hash-oracle-checkable against DuckDB.
  */
object CorpusOps {

  /** Spark-SQL snippet computing log2(`num`/`den`)·1e6 (floored at a 2^-20
    * quantization) as a BIGINT, for integer columns `num` >= `den` >= 1.
    *
    * Built ONLY from operations that IEEE 754 defines exactly — integer
    * arithmetic, correctly-rounded double multiply, division by powers of
    * two, comparisons — so any IEEE engine computes the identical integer.
    * Library `log2` has 1-ulp latitude that can flip `floor(log2(x)*1e6)`
    * across engines on boundary values; this construction cannot.
    *
    * Shape: integer part e = bitlength(num div den) - 1 (valid for any
    * rational >= 1, since floor(log2(r)) == floor(log2(floor(r)))); the
    * mantissa m0 = (num/den)/2^e in [1,2) is exact (power-of-two scaling
    * only moves the exponent); the fractional part is the classic 20-step
    * fixed-point binary log (square the mantissa, emit a bit, renormalize).
    * The DuckDB oracles mirror this construction as a 20-step recursive CTE
    * over the distinct inputs (NOT list_reduce — DuckDB 1.0's list_reduce
    * cross-contaminates struct accumulators between rows of a vector), so
    * the compared integers agree bit-for-bit.
    */
  private[graft] def log2e6Sql(num: String, den: String): String = {
    val e = s"(length(conv(($num) div ($den), 10, 2)) - 1)"
    val m0 = s"((CAST($num AS DOUBLE) / CAST($den AS DOUBLE)) / " +
      s"CAST(shiftleft(CAST(1 AS BIGINT), $e) AS DOUBLE))"
    val k = s"""aggregate(sequence(1, 20),
      named_struct('m', $m0, 'k', CAST(0 AS BIGINT)),
      (acc, i) -> IF(acc.m * acc.m >= CAST(2 AS DOUBLE),
        named_struct('m', acc.m * acc.m / CAST(2 AS DOUBLE), 'k', acc.k * 2 + 1),
        named_struct('m', acc.m * acc.m, 'k', acc.k * 2)),
      acc -> acc.k)"""
    s"(((CAST($e AS BIGINT) * 1048576 + $k) * 1000000) div 1048576)"
  }

  /** BM25 document scores (Robertson/Spärck Jones; k1 = 6/5, b = 3/4) for a
    * fixed query-term set, in EXACT integer arithmetic: with T = total
    * corpus tokens and N = corpus docs, the per-term denominator
    * tf + k1·(1 − b + b·dl/(T/N)) equals (10·tf·T + 3·T + 9·dl·N)/(10·T),
    * so term score = idf_e6 · tf · 22 · T div (10·tf·T + 3·T + 9·dl·N)
    * with idf_e6 the fixed-point log2(N/df) ([[log2e6Sql]]) — every value
    * is one BIGINT integer division away from integer inputs, nothing for
    * a library log or double rounding to flip.
    *
    * Magnitudes: idf_e6·tf·22·T stays in Long out to ~10^9 corpus tokens;
    * beyond that widen the product to DECIMAL(38,0) (same construction).
    * Scale: tf and dl partially aggregate map-side; df and the two corpus
    * scalars broadcast; docs containing no query term drop out of the
    * semi-join (score 0, absent — the documented contract).
    *
    * @return (id, n_terms, score_e6), one row per doc containing >= 1 term
    */
  def bm25(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      tokenMode: String = "ws"
  ): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(TextFunctions.tokenizerFor(tokenMode)(col(textCol))).as("token"))
    val dl = toks.groupBy("id").agg(count(lit(1)).as("dl"))
    val qtoks = toks.filter(col("token").isin(terms: _*))
    val tf = qtoks.groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = qtoks.select("id", "token").distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tTotal = toks.agg(count(lit(1)).as("t_total"))
    // idf depends only on (n_docs, df): fold once per query term on the
    // ≤|terms|-row df frame instead of once per (doc, term) row (r18)
    val idf = dfreq.crossJoin(nDocs)
      .withColumn("idf_e6", expr(log2e6Sql("n_docs", "df")))
      .select(col("token"), col("idf_e6"), col("n_docs"))
    tf.join(dl, "id")
      .join(broadcast(idf), "token")
      .crossJoin(broadcast(tTotal))
      .withColumn("term_e6", expr(
        "(idf_e6 * tf * 22 * t_total) div (10*tf*t_total + 3*t_total + 9*dl*n_docs)"))
      .groupBy("id")
      .agg(count(lit(1)).cast("long").as("n_terms"), sum("term_e6").as("score_e6"))
  }

  /** Per-document bigram-LM surprisal with add-one smoothing — the
    * perplexity-style quality signal one LM order above the unigram
    * surprisal query: the corpus itself is the language model, and a doc's
    * score is its mean negative log2 probability under the corpus's own
    * bigram statistics (low = predictable/templated, high = unusual or
    * noisy — the CCNet bucketing signal without an external model).
    *
    * P(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V); surprisal of each bigram
    * is the EXACT fixed-point log2((c1+V)/(c12+1)) ([[log2e6Sql]]), well-
    * defined since c1 + V >= c12 + 1 always — so per-doc sums and means
    * are pure BIGINT arithmetic that hash-match a SQL mirror.
    *
    * Scale: bigram and context counts partially aggregate map-side; the
    * per-bigram join back to the token stream shuffles on the bigram key
    * (the same class as the unigram join); V broadcasts as one scalar.
    *
    * @return (id, n_bigrams, sum_surprisal_e6, mean_surprisal_e6)
    */
  def bigramSurprisal(
      docs: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    // NOTE (r18): the lead()-window form is deliberate. Rewriting bigrams
    // as an in-row zip_with + caching the bigram stream measured 2.9×
    // SLOWER: the three consumers below share the window subtree, whose
    // exchange Spark deduplicates (ReuseExchange) — the window already
    // runs ONCE, while the cache paid a full string materialization.
    val toks = docs.select(col(idCol).as("id"),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "token")))
    val wdoc = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
    val bg = toks
      .withColumn("w2", lead(col("token"), 1).over(wdoc))
      .filter(col("w2").isNotNull)
      .select(col("id"), col("token").as("w1"), col("w2"))
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = toks.agg(countDistinct(col("token")).as("v"))
    // surprisal is a pure function of the bigram TYPE's counts (c1, c12,
    // v), so the 20-step fixed-point log2 fold is evaluated on the
    // type-level frame (distinct bigrams) and the occurrence stream joins
    // it in — not per occurrence row, where the identical integer was
    // recomputed once per token position (r18; same values, the fold is
    // deterministic). This also drops the second occurrence-stream join:
    // bg joins once on (w1, w2) instead of on (w1, w2) and then w1.
    val typ = c12.join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .withColumn("s_e6", expr(log2e6Sql("c1 + v", "c12 + 1")))
      .select("w1", "w2", "s_e6")
    bg.join(typ, Seq("w1", "w2"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s_e6")).as("sum_surprisal_e6"))
      .withColumn("mean_surprisal_e6", expr("sum_surprisal_e6 div n_bigrams"))
  }

  /** Corpus-wide boilerplate removal (the CCNet/Gopher repeated-line dedup
    * shape at sub-document granularity): split each doc into
    * non-overlapping `chunkTokens`-token chunks, count each chunk's
    * occurrences across the WHOLE corpus, drop chunks occurring more than
    * `maxOccurrences` times, and reassemble the survivors in position
    * order.
    *
    * Chunk identity is the exact chunk string (collision-free by
    * construction); at 100 TB the count table would key on the 59-bit
    * hash pair instead and the reassembly join would carry hashes — same
    * plan shape. Scale: the chunk count is one map-side-combinable
    * aggregation; reassembly sorts each doc's own chunks only.
    *
    * @return (id, n_chunks, n_removed, cleaned_text)
    */
  def removeBoilerplate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int = 3,
      maxOccurrences: Int = 2
  ): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val n = lit(chunkTokens)
    // chunk ONCE and cache: the corpus-wide frequency table and the
    // reassembly join both consume the chunk stream, and re-deriving it
    // meant tokenizing + re-chunking the whole corpus a second time
    val chunks = docs.select(
      col(idCol).as("id"),
      posexplode(transform(
        sequence(lit(0), ((size(toks) + n - lit(1)) / n).cast("int") - lit(1)),
        i => array_join(slice(toks, i * n + lit(1), n), " ")))
        .as(Seq("pos", "chunk")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freq = chunks.groupBy("chunk").agg(count(lit(1)).as("cnt"))
    val out = chunks.join(freq, "chunk")
      .groupBy("id")
      .agg(
        count(lit(1)).cast("long").as("n_chunks"),
        sum(when(col("cnt") > maxOccurrences, 1L).otherwise(0L)).as("n_removed"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("cnt") <= maxOccurrences, struct(col("pos"), col("chunk"))))),
            e => e.getField("chunk")),
          " ").as("cleaned_text"))
    val cut = org.apache.spark.sql.graft.bridge.cutLineage(out)
    cut.count()
    chunks.unpersist(blocking = false)
    cut
  }

  /** DSIR-style importance weights for data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every raw document by how much more likely its hashed-unigram
    * features are under the TARGET distribution (e.g. "wiki-like" or
    * in-domain docs) than under the raw corpus, then resample the raw
    * corpus by that weight. The classic recipe for tilting a 100 TB crawl
    * toward a small high-quality target set.
    *
    * Features: tokens hashed into `m` buckets via the polynomial
    * fingerprint mod m (the paper's hashed n-gram features at n=1). With
    * add-one smoothing, `p_f = (target_f + 1)/(T_target + m)` and
    * `q_f = (raw_f + 1)/(T_raw + m)`; the per-bucket log-ratio is the
    * EXACT fixed-point `log2e6` of the cross-multiplied integer rational
    * `A/B = (target_f+1)·(T_raw+m) / ((T_target+m)·(raw_f+1))`, sign-split
    * so the magnitude log always sees num ≥ den. A document's log-weight
    * is the sum of its tokens' bucket deltas — exact BIGINT end to end.
    *
    * Scale shape: two partial-aggregating groupBys onto `m` cells (the
    * reduce side is m rows, not vocab-sized), corpus totals as a 1-row
    * broadcast, and the m-row delta table broadcast back to the token
    * stream; the only corpus-sized shuffle is the final per-doc sum.
    * Precondition: per-side token totals must stay < ~2^31 so the cross
    * products fit BIGINT; at larger scale, pre-scale both counts (divide
    * num and den by a common power of two) before the log.
    *
    * @param targetCol boolean column marking the target subset
    * @return (id, n_tokens, w_e6) — w_e6 = Σ delta_e6 over the doc's tokens
    */
  def dsirLogWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetCol: String,
      m: Int = 1024,
      tokenMode: String = "ws"
  ): DataFrame = {
    // tokenize ONCE and cache the narrow hashed stream (id, tgt, f — the
    // token string is dropped before the cache): the per-cell counts and
    // the final per-doc join both consume it, and re-deriving it meant a
    // second full tokenize+hash pass over the corpus
    val toks = hashedTokens(docs, idCol, textCol, targetCol, m, tokenMode)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = dsirWeightsFrom(toks, m)
    // per-doc result is small: cut + materialize so the token cache frees
    // here instead of living past the operator (the Itemsets discipline)
    val cut = org.apache.spark.sql.graft.bridge.cutLineage(out)
    cut.count()
    toks.unpersist(blocking = false)
    cut
  }

  /** The UNCUT, uncached DSIR plan — `dsirLogWeights` minus the token
    * cache and the lineage cut, so plan-shape pins (PlanSpec) can assert
    * the broadcast/exchange structure that the production path's cut
    * RDD-scan leaf hides. Same expressions, same result.
    */
  private[graft] def dsirLogWeightsUncut(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetCol: String,
      m: Int = 1024,
      tokenMode: String = "ws"
  ): DataFrame =
    dsirWeightsFrom(hashedTokens(docs, idCol, textCol, targetCol, m, tokenMode), m)

  private def hashedTokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetCol: String,
      m: Int,
      tokenMode: String
  ): DataFrame =
    docs.select(col(idCol).as("id"), col(targetCol).as("__tgt"),
        explode(TextFunctions.tokenizerFor(tokenMode)(col(textCol))).as("token"))
      .withColumn("f",
        pmod(TextFunctions.polyHash(col("token"), lit(0L)), lit(m.toLong)))
      .select(col("id"), col("__tgt"), col("f"))

  private def dsirWeightsFrom(toks: DataFrame, m: Int): DataFrame = {
    // ONE tokenization pass yields both per-cell counts (raw + target as a
    // conditional sum), and the corpus-wide totals are a sum over the
    // resulting m-row frame — not two more corpus scans.
    val byF = toks.groupBy("f").agg(
      count(lit(1)).as("raw_f"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("target_f"))
    val totals = byF.agg(
      sum(col("target_f")).as("t_target"),
      sum(col("raw_f")).as("t_raw"))
    val delta = byF
      .crossJoin(broadcast(totals))
      .withColumn("__a",
        (col("target_f") + lit(1L)) * (col("t_raw") + lit(m.toLong)))
      .withColumn("__b",
        (col("t_target") + lit(m.toLong)) * (col("raw_f") + lit(1L)))
      .withColumn("__mag",
        expr(log2e6Sql("greatest(__a, __b)", "least(__a, __b)")))
      .withColumn("delta_e6",
        when(col("__a") >= col("__b"), col("__mag")).otherwise(-col("__mag")))
      .select("f", "delta_e6")
    toks
      .join(broadcast(delta), "f")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("delta_e6")).as("w_e6"))
  }

  /** Duplicate-SPAN removal (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better", arXiv:2107.06499 §ExactSubstr): every
    * `windowTokens`-token window that occurs more than once in the corpus
    * keeps its FIRST occurrence (min (doc, start) order) and is cut from
    * the token stream everywhere else — the text-REWRITING complement of
    * [[graft.text.MinHash.substringDupGroups]] (which only groups the
    * affected docs) and of [[removeBoilerplate]] (which drops every
    * occurrence of high-frequency chunks, first included). Overlapping
    * removed windows merge naturally: removal is the union of their
    * covered token positions.
    *
    * Shape (all linear in corpus tokens, ~`windowTokens`× constants):
    * window occurrences are `(doc, start, 59-bit window hash)` rows from
    * one scan; the canonical occurrence per hash is a `row_number` over
    * the hash (one shuffle, the op's only corpus-sized exchange — the
    * suffix-array sort of the paper plays the same role); non-canonical
    * occurrences explode to covered positions (bounded by removed volume
    * × window, not corpus × window); survivors are a position anti-join
    * and per-doc reassembly. Output is one row per input doc:
    * `(id, n_tokens, n_removed, cleaned_text)` over the lower-cased token
    * stream ([[TextFunctions.tokens]] — the op rewrites the tokenized
    * corpus, the form training pipelines dedup in).
    *
    * Docs shorter than `windowTokens` produce no windows, are never cut,
    * and pass through whole. A doc can be cut to the empty string when
    * every position is covered (a pure duplicate tail of another doc).
    *
    * Collision safety — this op is EXACT, matching the reference
    * technique (Lee et al. use suffix arrays, whose matches are literal):
    * because it rewrites text (unlike the grouping ops, where a hash
    * collision only over-groups), every removal candidate's window TEXT
    * is compared against the canonical occurrence's window text before
    * any cut — the hash only proposes, the string compare decides. A
    * window whose identity hash collides with a different window is kept,
    * never cut, with probability 1 (not 1 − 2^-123 as in the pre-r11
    * double-hash form).
    */
  def removeDupSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 50
  ): DataFrame =
    removeDupSpansImpl(docs, idCol, textCol, windowTokens,
      g => graft.functions.exprs.polyBase(g) * lit(TextFunctions.PolyMod2) +
        graft.functions.exprs.polyBase2(g))

  /** Core of [[removeDupSpans]] with the window-identity hash injectable so
    * the collision guard is testable (a real 59-bit collision cannot be
    * constructed in a test; a deliberately weak `idHash` can).
    */
  private[text] def removeDupSpansImpl(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int,
      idHash: Column => Column
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = windowTokens
    require(w >= 2, s"windowTokens must be >= 2, got $w")
    // referenced three times below (occurrences, token stream, doc lengths);
    // tokenization is a stateless narrow map, so recomputation beats pinning
    // a corpus-sized frame in the block manager (same posture as
    // removeBoilerplate)
    val toks = docs.select(
      col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("t"))
    // (doc, start, window-hash) occurrence rows; posexplode's pos IS the
      // 0-based window start. Hash identity is the 59-bit polynomial pair
      // (see MinHash.substringDupGroups for the de-percolation rationale).
      val occ = toks.filter(size(col("t")) >= w)
        .select(col("id"),
          posexplode(transform(
            sequence(lit(0), size(col("t")) - lit(w)),
            i => array_join(slice(col("t"), i + lit(1), lit(w)), " ")))
            .as(Seq("start", "__g")))
        .select(col("id"), col("start"), idHash(col("__g")).as("wh"))
      // canonical occurrence = first in (doc, start) order; all later
      // occurrences of the same window are removed. The canonical pick is
      // a partial-aggregatable min(struct) per hash, NOT a row_number
      // window: on the corpora this operator targets, one hot boilerplate
      // window can occur millions of times, and a window partition would
      // single-reducer-sort all of them — the min-struct combines map-side
      // and the join back carries one row per distinct hash.
      val canon = occ.groupBy("wh")
        .agg(min(struct(col("id"), col("start"))).as("__c"))
      val cand = occ.join(canon, "wh")
        .filter(struct(col("id"), col("start")) =!=
          struct(col("__c.id").as("id"), col("__c.start").as("start")))
        .select(col("id"), col("start"),
          col("__c.id").as("cid"), col("__c.start").as("cstart"))
      // EXACT verification before any cut: a hash only PROPOSES a removal;
      // the decision compares the candidate window's literal text against
      // the canonical occurrence's. Both texts are re-sliced from the token
      // stream (toks is a narrow stateless map — same recompute-over-pin
      // posture as above), keyed by the (id, start) / (cid, cstart) the
      // candidate row already carries. Cost is O(candidate pairs) joined
      // rows: the non-candidate corpus never enters either join's build
      // side, and with AQE the (typically tiny) candidate side broadcasts,
      // so the verify adds no corpus-sized exchange. A collision (equal
      // identity hash, different text) fails the compare and the window is
      // left in place — exactness matching the paper's suffix-array form.
      val candWin = cand.join(toks, Seq("id"))
        .select(col("id"), col("start"), col("cid"), col("cstart"),
          array_join(slice(col("t"), col("start") + lit(1), lit(w)), " ")
            .as("__wtext"))
      val canonWin = cand.select(col("cid"), col("cstart")).distinct()
        .join(toks.select(col("id").as("cid"), col("t")), Seq("cid"))
        .select(col("cid"), col("cstart"),
          array_join(slice(col("t"), col("cstart") + lit(1), lit(w)), " ")
            .as("__ctext"))
      val removed = candWin.join(canonWin, Seq("cid", "cstart"))
        .filter(col("__wtext") === col("__ctext"))
      // union of covered positions — distinct because overlapping removed
      // windows cover shared positions
      val covered = removed
        .select(col("id"),
          explode(sequence(col("start"), col("start") + lit(w - 1))).as("pos"))
        .distinct()
      val kept = toks
        .select(col("id"), posexplode(col("t")).as(Seq("pos", "tok")))
        .join(covered, Seq("id", "pos"), "left_anti")
        .groupBy("id")
        .agg(
          count(lit(1)).as("__n_kept"),
          array_join(
            transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
              e => e.getField("tok")), " ").as("cleaned_text"))
      toks.select(col("id"), size(col("t")).cast("long").as("n_tokens"))
        .join(kept, Seq("id"), "left")
        .select(col("id"),
          col("n_tokens"),
          (col("n_tokens") - coalesce(col("__n_kept"), lit(0L))).as("n_removed"),
          coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }
}
