package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-vector operators over `ArrayType(FloatType)` columns
  * (BASELINE.json north-star similarity search).
  *
  * Dot products are explicit sequential left-folds (`aggregate` over
  * `zip_with`) in double precision — bit-reproducible across engines
  * (DuckDB: list_reduce(list_prepend(0.0, list_transform(...)))), unlike
  * `list_cosine_similarity`-style builtins whose internal precision is
  * unspecified.
  *
  * Scale shape: [[bruteForceTopK]] broadcasts the (small) query set and
  * streams the corpus — no corpus shuffle, per-partition top-k via window
  * rank on (query, sim). [[lshBuckets]] gives the sub-linear path: random
  * hyperplane signs (deterministic pseudo-random planes derived from
  * xxhash64) bucket the corpus once; queries probe only their bucket.
  */
object VectorFunctions {

  /** Sequential left-fold dot product / cosine, computed by the codegen'd
    * kernel expressions in [[graft.functions]] — bit-identical to the
    * interpreted `aggregate(zip_with(...))` form (same element order and
    * association), which is what the DuckDB oracles replicate.
    */
  def dot(a: Column, b: Column): Column = graft.functions.exprs.dotProduct(a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = graft.functions.exprs.cosineSim(a, b)

  /** The centroid table (cell, vector) as a single array<struct> literal.
    * Centroid sets are nlist-sized (dimension-table scale, k-means k) —
    * collecting them to the driver is bounded and is what makes the
    * per-row assignment NARROW: the alternative crossJoin+window argmax
    * shuffles corpus×nlist rows through a row_number exchange per
    * assignment, a 16-billion-row exchange at 10⁹ vectors.
    */
  private def centroidArray(cents: DataFrame): Column = {
    import org.apache.spark.sql.types._
    val schema = cents.schema
    val rows = cents.collect()
    // literal types follow the frame's own schema (primitive cell ids,
    // float OR double vectors) — the crossJoin formulation this replaces
    // was type-agnostic and the narrow path must accept the same inputs
    def centLit(r: org.apache.spark.sql.Row): Column = schema(1).dataType match {
      case ArrayType(FloatType, _) => typedLit(r.getSeq[Float](1).toSeq)
      case ArrayType(DoubleType, _) => typedLit(r.getSeq[Double](1).toSeq)
      case other => throw new IllegalArgumentException(
        s"unsupported centroid vector type $other (expected array<float|double>)")
    }
    if (rows.isEmpty)
      // empty centroid set ⇒ empty assignment (the crossJoin yielded no
      // rows); keep the element type honest so downstream analysis holds
      array().cast(ArrayType(StructType(Seq(
        StructField("cell", schema(0).dataType),
        StructField("cent", schema(1).dataType)))))
    else
      array(rows.toIndexedSeq.map { r =>
        struct(lit(r.get(0)).as("cell"), centLit(r).as("cent"))
      }: _*)
  }

  /** Ordered top-`keep` nearest cells of `vec` against the centroid-array
    * literal, as array<long> — a pure per-row expression (transform +
    * array_sort + slice): zero joins, zero shuffles, codegen-friendly.
    * Ordering matches the window formulation it replaces exactly:
    * sim DESC, then cell ASC as the deterministic tiebreak.
    */
  private def nearestCells(vec: Column, centArr: Column, keep: Int): Column = {
    val sims = transform(centArr, c =>
      struct(cosine(vec, c.getField("cent")).as("sim"), c.getField("cell").as("cell")))
    // ordering must equal the window formulation bit for bit, including
    // degenerate sims: Spark's desc sort places NaN ABOVE every number,
    // so NaN ranks first here too (and NaN-vs-NaN falls to the cell
    // tiebreak) — without the explicit isnan arms both comparisons are
    // false for NaN and the comparator would interleave by cell id
    val sorted = array_sort(sims, (l, r) => {
      val (ls, rs) = (l.getField("sim"), r.getField("sim"))
      // NULL sims (NULL embedding ⇒ NULL cosine) must sort AFTER every
      // real sim, mirroring desc-nulls-last in the window form — without
      // these arms every comparison on NULL is false and NULL-sim entries
      // interleave by cell id, assigning cell 0 instead of ranking last
      when(isnull(ls) && isnull(rs),
          when(l.getField("cell") < r.getField("cell"), lit(-1))
            .when(l.getField("cell") > r.getField("cell"), lit(1))
            .otherwise(lit(0)))
        .when(isnull(ls), lit(1))
        .when(isnull(rs), lit(-1))
        .when(isnan(ls) && !isnan(rs), lit(-1))
        .when(!isnan(ls) && isnan(rs), lit(1))
        .when(ls > rs, lit(-1))
        .when(ls < rs, lit(1))
        .when(l.getField("cell") < r.getField("cell"), lit(-1))
        .when(l.getField("cell") > r.getField("cell"), lit(1))
        .otherwise(lit(0))
    })
    transform(slice(sorted, 1, keep), t => t.getField("cell"))
  }

  /** [[assignCells]] with the centroid literal precomputed — collect the
    * centroid frame ONCE per operator call even when both the corpus and
    * the query side assign against it.
    */
  private def assignCellsWith(
      df: DataFrame, id: String, outId: String, vec: String,
      centArr: Column, keep: Int): DataFrame =
    df.select(
      col(id).as(outId),
      col(vec).as(s"__v_$outId"),
      explode(nearestCells(col(vec), centArr, keep)).as("cell"))

  /** (id, vector, cell) with one row per (row, assigned cell), cells =
    * the `keep` nearest centroids. Narrow: the only non-map operation is
    * the generator explode.
    */
  private[graft] def assignCells(
      df: DataFrame, id: String, outId: String, vec: String,
      cents: DataFrame, keep: Int): DataFrame =
    assignCellsWith(df, id, outId, vec, centroidArray(cents), keep)

  /** Per-row nearest-cell-by-squared-L2 expression builder for the
    * product-quantization paths — the [[centroidArray]] driver-side-
    * bounded collect (m·ksub rows, k-means-k scale) UNROLLED into a
    * whole-stage-codegen expression, so PQ assignment is the same NARROW
    * per-row argmin the IVF path uses instead of a broadcast-join×ksub
    * row blowup through a row_number exchange (corpus×m×ksub rows per
    * training iteration / encode pass).
    *
    * Shape: per subspace, ONE static-call kernel
    * ([[graft.functions.VectorKernels.nearestCellIdx]]) over the
    * subspace's flattened centroid literal — the full argmin loop runs
    * inside whole-stage codegen as a tight double loop. The ordering IS
    * the window ordering it replaces bit for bit (exact l2sq folds,
    * d asc with NULL-vector nulls-first handled by an explicit arm, NaN
    * after every real number, tie → cell asc via the strict-improvement
    * scan over cell-sorted centroids). No higher-order lambdas and no
    * per-element struct allocation: an array_sort-comparator form
    * measured 33% SLOWER than the join it replaced (interpreted
    * comparator per element) and a least(struct...) unroll 2.7× slower
    * (interpreted struct ordering per compare) — the kernel form is the
    * only one that beats the codegen'd join+window.
    *
    * @param cents (sub: int, cell, cent: array<float|double>) — every sub
    *              in 0 until m present (seeding explodes all m subspaces)
    * @return (sv, sub) => nearest cell id
    */
  private def nearestCellL2Expr(
      cents: DataFrame, m: Int): (Column, Column) => Column = {
    import org.apache.spark.sql.types._
    val schema = cents.schema
    require(schema(2).dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }, s"unsupported centroid vector type ${schema(2).dataType} (expected array<float>)")
    val rows = cents.collect()
    def subOf(r: org.apache.spark.sql.Row): Int = r.get(0) match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case other => throw new IllegalArgumentException(
        s"unsupported sub index type ${other.getClass} (expected integral)")
    }
    def cellOrd(r: org.apache.spark.sql.Row): Long = r.get(1) match {
      case i: Int => i.toLong
      case l: Long => l
      case s: Short => s.toLong
      case other => throw new IllegalArgumentException(
        s"unsupported cell id type ${other.getClass} (expected integral)")
    }
    val bySub = rows.groupBy(subOf)
    (sv: Column, sub: Column) => {
      val branches = (0 until m).flatMap { s =>
        bySub.get(s).map { rsUnsorted =>
          // cell-ascending order: the kernel keeps strict improvements
          // only, so scanning ascending cells reproduces the
          // (d asc, cell asc) window winner exactly
          val rs = rsUnsorted.sortBy(cellOrd)
          val flat = rs.flatMap(_.getSeq[Float](2)).toIndexedSeq
          val cellsLit = array(rs.toIndexedSeq.map(r => lit(r.get(1))): _*)
          val idx = graft.functions.exprs
            .nearestCellIdxL2(sv, typedLit(flat), rs.length)
          // NULL vector ⇒ every distance NULL ⇒ the window's asc
          // nulls-first tie falls to cell asc = the smallest cell
          val best = when(sv.isNull, lit(rs.head.get(1)))
            .otherwise(element_at(cellsLit, idx + 1))
          (sub === s) -> best
        }
      }
      branches.foldRight(lit(null).cast(schema(1).dataType): Column) {
        case ((cond, value), acc) => when(cond, value).otherwise(acc)
      }
    }
  }

  /** Exact top-k cosine neighbors of each query vector.
    * Output: (query_id, neighbor_id, sim, rank), rank 1..k, self excluded,
    * ties broken by neighbor id for determinism.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Two-stage quantized retrieval (the standard int8 shortlist + float
    * re-rank posture of production ANN): corpus and query vectors are
    * symmetric-int8 quantized per vector (codes = floor(x·127/amax + ½),
    * the q_vec_quant construction), the shortlist is the top-`shortlist`
    * by the EXACT-integer key amax_e6(doc) · Σ(qcode·dcode) — the query's
    * own scale is constant per query and drops out of the ordering — and
    * the final top-`k` re-ranks the shortlist by true float cosine.
    *
    * Every shortlist comparison is BIGINT arithmetic (codes and the
    * floored per-vector scale), so the candidate set is bit-reproducible
    * across engines; only the final re-rank touches floats (the same
    * sequential fold the float top-k oracles already pin down). At scale
    * the int8 corpus is 4× smaller than float32 — the scan stage streams
    * codes only; full vectors are touched for shortlist·|queries| rows.
    *
    * Ranking caveat: the key `amax_e6 · Σ(qcode·dcode)` approximates
    * dot-product order only when per-doc scales are COMPARABLE (e.g.
    * unit-normalized embeddings, the usual cosine-retrieval posture).
    * For mixed-sign dots a larger amax pushes a negative key further
    * down, so adversarially heterogeneous scales can reorder the
    * shortlist relative to true dot ranking — the float re-rank then
    * only sees what the shortlist admitted (the recall@5 eval query
    * measures this on the default data, not adversarial scales).
    * `amax_e6` is clamped to ≥ 1 so near-zero vectors (amax < 1e-6)
    * keep a direction-sensitive key instead of collapsing to 0.
    *
    * Output: (query_id, neighbor_id, sim, rank, int8_key, srank) —
    * rank 1..k by cosine, srank the candidate's shortlist position.
    */
  def annInt8Rerank(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      shortlist: Int = 20
  ): DataFrame = {
    def coded(df: DataFrame, idAs: String, p: String) = df
      .select(col(idCol).as(idAs), col(vecCol).as(s"__${p}v"))
      .withColumn(s"__${p}amax",
        greatest(array_max(col(s"__${p}v")).cast("double"),
          -array_min(col(s"__${p}v")).cast("double"), lit(1e-12)))
      .withColumn(s"__${p}c", expr(
        s"transform(__${p}v, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / __${p}amax + 0.5) AS BIGINT))"))
    val c = coded(corpus, "neighbor_id", "c")
      .withColumn("__amax_e6",
        greatest(floor(col("__camax") * lit(1e6)).cast("long"), lit(1L)))
    val q = coded(queries, "query_id", "q")
    val ws = Window.partitionBy("query_id")
      .orderBy(col("int8_key").desc, col("neighbor_id"))
    val wr = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("int8_key",
        col("__amax_e6") * graft.functions.exprs.dotProductLong(col("__qc"), col("__cc")))
      .withColumn("srank", row_number().over(ws))
      .filter(col("srank") <= shortlist)
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("rank"), col("int8_key"), col("srank").cast("int").as("srank"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of any
    * number of per-query rankings — the standard hybrid-retrieval
    * combiner (lexical ⊕ semantic, or coarse ⊕ fine ANN stages), in
    * EXACT integer arithmetic: each list contributes
    * `1e6 div (rrfK + rank)` and the fused order is by the summed
    * contribution (ties → neighbor id), so fusion is bit-reproducible
    * and oracle-checkable — no float score normalization, which is
    * precisely why RRF is preferred over score fusion in practice.
    *
    * Scale shape: a union of ranking frames (each already top-limited by
    * its producer), one partially-aggregated groupBy, one per-query
    * window over ≤ Σ list lengths rows — never corpus-sized.
    *
    * @param rankings frames with (query_id, neighbor_id, rank) columns
    * @return (query_id, neighbor_id, rrf_e6, n_lists, frank), frank ≤ topK
    */
  def rrfFuse(rankings: Seq[DataFrame], rrfK: Int = 60, topK: Int = 5): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val u = rankings
      .map(_.select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank")))
      .reduce(_.unionByName(_))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_e6").desc, col("neighbor_id"))
    u.withColumn("contrib", expr(s"1000000L div (${rrfK}L + rank)"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("contrib")).as("rrf_e6"),
        count(lit(1)).cast("int").as("n_lists"))
      .withColumn("frank", row_number().over(w))
      .filter(col("frank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("rrf_e6"),
        col("n_lists"), col("frank").cast("int").as("frank"))
  }

  /** Squared-L2 distance (sequential double fold — the PQ metric),
    * computed by the codegen'd [[graft.functions.L2Sq]] kernel.
    */
  def l2Sq(a: Column, b: Column): Column = graft.functions.exprs.l2Sq(a, b)

  private def subCol(vec: Column, sub: Column, m: Int): Column = {
    // dim must be divisible by m; int-cast because Spark's `/` is always
    // fractional and slice() requires int offsets
    val dsub = (size(vec) / m).cast("int")
    slice(vec, sub * dsub + 1, dsub)
  }

  /** Product-quantization codebooks (Jégou et al. 2011): the vector space is
    * split into `m` contiguous subspaces of dim/m components and each
    * subspace gets its own `ksub`-centroid k-means codebook, trained by the
    * same engine-portable Lloyd loop as [[kmeans]] — multiplicative-hash
    * seeding (the first `ksub` corpus vectors' sub-slices; cells keyed by
    * seed vec id), squared-L2 argmin assignment with ties on cell,
    * decimal-exact per-component means, empty cells keep their previous
    * centroid. All m codebooks train in the SAME jobs (subspace is just
    * another grouping key), so training cost is one assign + one mean
    * shuffle per iteration regardless of m.
    *
    * Returns (sub, cell, centroid: array<float>) — m·ksub rows, pinned to
    * the driver per iteration like [[kmeans]] (k rows ≪ executor memory).
    */
  def pqCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 4,
      ksub: Int = 8,
      iters: Int = 1
  ): DataFrame = {
    val vecs = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val subIdx = explode(sequence(lit(0), lit(m - 1)))
    val subs = vecs
      .select(col("__id"), col("__v"), subIdx.as("sub"))
      .select(col("__id"), col("sub"), subCol(col("__v"), col("sub"), m).as("__sv"))
    val seedHash =
      (col("__id").cast("long") % 1000000007L) * 2654435761L % 1000000007L
    var cents = vecs.orderBy(seedHash, col("__id")).limit(ksub)
      .select(col("__id").as("cell"), col("__v"), subIdx.as("sub"))
      .select(col("sub"), col("cell"), subCol(col("__v"), col("sub"), m).as("__cent"))
    for (_ <- 0 until iters) {
      // narrow per-row argmin against the m·ksub centroid literals — no
      // broadcast-join×ksub row blowup and no per-iteration row_number
      // exchange of corpus×m×ksub rows (the kmeans/IVF assignCells
      // discipline, L2 flavor); assignment identical bit for bit
      val nearest = nearestCellL2Expr(cents, m)
      val assigned = subs.select(
        col("sub"),
        nearest(col("__sv"), col("sub")).as("cell"),
        col("__sv"))
      val updated = assigned
        .select(col("sub"), col("cell"), posexplode(col("__sv")).as(Seq("pos", "x")))
        .groupBy("sub", "cell", "pos")
        // decimal-exact mean, order-independent (the kmeans discipline)
        .agg((sum(col("x").cast("double")
            .cast(org.apache.spark.sql.types.DecimalType(38, 6))).cast("double")
          / count(lit(1))).as("m"))
        .groupBy("sub", "cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("sub"), col("cell"),
          transform(col("pm"), e => e.getField("m").cast("float")).as("__new"))
      cents = cents.join(updated, Seq("sub", "cell"), "left")
        .select(col("sub"), col("cell"),
          coalesce(col("__new"), col("__cent")).as("__cent"))
      cents = cents.sparkSession.createDataFrame(
        cents.collectAsList(), cents.schema) // m·ksub rows: pin, cut lineage
    }
    cents.select(col("sub"), col("cell"), col("__cent").as("centroid"))
  }

  /** PQ codes for every corpus vector against trained codebooks:
    * (id, sub, cell) — the nearest codebook centroid (squared-L2, ties on
    * cell) per subspace. m rows per vector; at rest this is the m·log2(ksub)-
    * bit compressed representation (64-dim float32 → 4 cells ≈ 64× smaller),
    * which is the entire point of PQ at corpus scale: the ADC scan below
    * streams codes only and never touches full vectors.
    */
  def pqEncode(
      corpus: DataFrame,
      codebooks: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 4
  ): DataFrame = {
    // narrow per-row argmin (see pqCodebooks): encoding is a pure map
    // pass — explode(m) + one expression per (vector, subspace), zero
    // joins, zero window exchanges; winner identical to the row_number
    // formulation it replaces
    val nearest = nearestCellL2Expr(
      codebooks.select(col("sub"), col("cell"), col("centroid")), m)
    corpus
      .select(col(idCol).as("id"), col(vecCol).as("__v"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .select(col("id"), col("sub"),
        nearest(subCol(col("__v"), col("sub"), m), col("sub")).as("cell"))
  }

  /** Product-quantization ANN with asymmetric distance computation and
    * exact re-rank — the memory-bound scale path of production vector
    * search (Jégou et al. 2011, the IVFPQ family): corpus vectors are
    * stored as m codebook cells ([[pqEncode]]), each query precomputes a
    * distance LUT (its squared-L2 to every codebook centroid — m·ksub
    * doubles, broadcast), the approximate distance of a doc is the
    * sequential sum of its m LUT entries in subspace order (ADC), the
    * `shortlist` closest by ADC are re-ranked by true float cosine.
    *
    * Engine-portable end to end: L2 folds and the ADC sum are sequential
    * double-precision folds (subspace order pinned by an array_sort), the
    * codebook training is the decimal-exact Lloyd loop — so shortlist AND
    * final ranking hash-match a SQL mirror, training included.
    *
    * Scale shape: the corpus is encoded ONCE into an (id, codes[m]) index
    * (the 64× compression), and the query scan is a single codegen'd
    * kernel pass over that index against broadcast flat LUTs
    * ([[graft.functions.AdcDistance]]) — no per-(query, doc) row blowup,
    * no join, no aggregate in the hot path. Full vectors are touched only
    * for shortlist·|queries| re-rank rows. At 10⁹×64-dim this is a 64×
    * scan-bandwidth reduction vs float32 brute force, with the same plan
    * shape as [[annInt8Rerank]] (whose 4× is the lighter-compression
    * point on the same tradeoff curve).
    *
    * Output: (query_id, neighbor_id, sim, rank, adc, srank) — rank 1..k by
    * true cosine within the shortlist, srank the ADC shortlist position.
    */
  /** A trained PQ index: dense-indexed codebooks (sub, cell, cellidx,
    * centroid) and the per-doc compressed codes (neighbor_id, __codes[m]).
    * Built once per corpus ([[pqIndex]]); queried many times ([[pqQuery]])
    * — the deployment split that amortizes training/encoding across query
    * batches. Callers persist `codes` between batches.
    */
  final case class PqIndex(books: DataFrame, codes: DataFrame, m: Int, ksub: Int)

  /** Train codebooks and encode the corpus — the one-time index build. */
  def pqIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 4,
      ksub: Int = 8,
      trainIters: Int = 1
  ): PqIndex = {
    val books = pqCodebooks(corpus, idCol, vecCol, m, ksub, trainIters)
    // dense per-subspace centroid index 0..ksub-1 (deterministic by cell
    // id) — the LUT subscript the ADC kernel uses
    val wIdx = Window.partitionBy("sub").orderBy("cell")
    val ibooks = books
      .withColumn("cellidx", (row_number().over(wIdx) - 1).cast("long"))
    // ONE codes array per doc (the compressed index, built once): the ADC
    // scan then reads m small ints per doc — no per-(query,doc) row blowup
    val codes = pqEncode(corpus, ibooks, idCol, vecCol, m)
      .join(broadcast(ibooks.select("sub", "cell", "cellidx")), Seq("sub", "cell"))
      .groupBy(col("id").as("neighbor_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("cellidx")))).as("sc"))
      .select(col("neighbor_id"), expr("transform(sc, e -> e.cellidx)").as("__codes"))
    PqIndex(ibooks, codes, m, ksub)
  }

  /** ADC scan + exact re-rank of a query batch against a built index. */
  def pqQuery(
      index: PqIndex,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      shortlist: Int = 20
  ): DataFrame = {
    val (ibooks, codes, m, ksub) = (index.books, index.codes, index.m, index.ksub)
    // per-query FLAT distance LUT (subspace-major, m·ksub doubles)
    val lut = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .select(col("query_id"), col("sub"), subCol(col("__qv"), col("sub"), m).as("__qsv"))
      .join(ibooks, Seq("sub"))
      .select(col("query_id"), col("sub"), col("cellidx"),
        l2Sq(col("__qsv"), col("centroid")).as("__d"))
      .groupBy("query_id")
      .agg(array_sort(collect_list(struct(col("sub"), col("cellidx"), col("__d")))).as("sd"))
      .select(col("query_id"), expr("transform(sd, e -> e.__d)").as("__lut"))
    // ADC = Σ_s lut[s·ksub + codes[s]], summed in subspace order inside
    // the codegen'd kernel — same value and association as the per-sub
    // fold a SQL mirror computes, one tight loop per (query, doc) pair
    val adc = codes
      .crossJoin(broadcast(lut))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc",
        graft.functions.exprs.adcDistance(col("__codes"), col("__lut"), ksub))
      .select(col("query_id"), col("neighbor_id"), col("adc"))
    val ws = Window.partitionBy("query_id").orderBy(col("adc").asc, col("neighbor_id"))
    val wr = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    val shortlisted = adc
      .withColumn("srank", row_number().over(ws))
      .filter(col("srank") <= shortlist)
    // re-rank: the ≤ shortlist·|queries| winners BROADCAST to the corpus
    // scan (statistics can't see how small the post-window frame is, so an
    // unhinted join would shuffle the whole corpus)
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .join(broadcast(shortlisted), Seq("neighbor_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))),
        Seq("query_id"))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"),
        col("adc"), col("srank").cast("int").as("srank"))
  }

  /** [[pqIndex]] + [[pqQuery]] in one call — the single-shot form the
    * oracled queries use (training included in the hash-checked surface).
    */
  def pqRerank(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int = 4,
      ksub: Int = 8,
      shortlist: Int = 20,
      trainIters: Int = 1
  ): DataFrame =
    pqQuery(pqIndex(corpus, idCol, vecCol, m, ksub, trainIters),
      corpus, queries, idCol, vecCol, k, shortlist)

  /** All `tables` random-hyperplane bucket ids as an array (random
    * projection LSH, Charikar 2002), computed in one kernel pass
    * ([[graft.functions.HyperplaneBuckets]]: deterministic plane matrix,
    * sign bits MSB-first per table); the caller explodes it into
    * (table, bucket) probe rows.
    */
  private def lshBuckets(vec: Column, nbits: Int, tables: Int): Column =
    graft.functions.exprs.hyperplaneBuckets(vec, nbits, tables)

  /** Approximate top-k with IVF (inverted-file) partitioning — the other
    * standard ANN scale path: assign every corpus vector to its nearest of
    * `nlist` coarse centroids once, then each query scores only the
    * vectors in its `nprobe` closest cells.
    *
    * "Training" is a deterministic stub: centroids = the first `nlist`
    * corpus vectors by id (a real implementation would run k-means||;
    * the partition/probe plumbing — the part that matters at scale — is
    * identical). Cells are an equi-join key, so candidate scoring is a
    * plain hash join on `cell`; candidates ≈ corpus × nprobe / nlist.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4
  ): DataFrame = {
    // Cells are keyed by the seed centroid's own id — no dense renumbering
    // needed (cell ids only need to be distinct + deterministic, not
    // 1..nlist). Assignment is the narrow per-row argmax (see
    // assignCells) — the corpus never shuffles to learn its cell.
    val cents = corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).as("cell"), col(vecCol).as("__cent"))
    val centArr = centroidArray(cents) // one collect for both sides

    val cAssigned = assignCellsWith(corpus, idCol, "neighbor_id", vecCol, centArr, keep = 1)
    val qProbes = assignCellsWith(queries, idCol, "query_id", vecCol, centArr, keep = nprobe)

    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    cAssigned
      .join(broadcast(qProbes), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("__v_query_id"), col("__v_neighbor_id")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Lloyd's k-means over embedding columns — the real IVF trainer behind
    * [[ivfTopK]]'s deterministic stub. Each iteration is two shuffle-sound
    * steps expressed in the same shapes the oracled queries use:
    *
    *  1. ASSIGN: per-vector argmax cosine as a pure row expression over
    *     the k-row centroid-array literal (sim desc, cell-asc tiebreak) —
    *     corpus never shuffles, and there is no per-iteration exchange.
    *  2. UPDATE: posexplode members to (cell, pos) cells and mean them —
    *     partially-aggregatable (map-side combine), no per-vector state,
    *     the exact q_centroid shape. The mean is decimal-exact (each
    *     component rounded to DECIMAL(38,6), summed exactly, divided as
    *     double) so it is independent of partial-aggregation order — the
    *     same `dsum` discipline every oracled double aggregate uses.
    *
    * Deterministic AND engine-portable: seeds are the first `k` corpus
    * vectors ordered by the multiplicative hash ((id % P) * 2654435761) % P
    * (P = 1e9+7, exact in 64-bit integers in any engine) — id order would
    * take whatever cluster happens to come first; hash order is a
    * reproducible stand-in for uniform random seeding (k-means|| would
    * sharpen coverage without changing the iteration structure). Ties in
    * assignment break on cell id, iteration count is fixed. Cells that lose
    * every member keep their previous centroid. Every step is expressible
    * in ANSI SQL, which is what lets the driver gate hash-check the trained
    * IVF path (q_ann_ivf_trained) against a DuckDB mirror of the whole
    * training loop. Returns (cell, centroid: array<float>).
    *
    * Scale: per iteration one broadcast (k·dim doubles) + one shuffle of
    * corpus_rows·dim cells — at 10⁹ vectors × 64 dims that is the same
    * cost class as one groupBy; k-means|| seeding could replace first-k
    * seeds without touching the iteration structure.
    */
  def kmeans(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 5
  ): DataFrame = {
    val vecs = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val seedHash =
      (col("__id").cast("long") % 1000000007L) * 2654435761L % 1000000007L
    var cents = vecs.orderBy(seedHash, col("__id")).limit(k)
      .select(col("__id").as("cell"), col("__v").as("__cent"))
    for (_ <- 0 until iters) {
      // narrow per-row argmax against the k-row centroid literal — no
      // crossJoin, no per-iteration row_number shuffle of corpus×k rows
      val centArr = centroidArray(cents)
      val assigned = vecs.select(
        element_at(nearestCells(col("__v"), centArr, 1), 1).as("cell"),
        col("__v"))
      val updated = assigned
        .select(col("cell"), posexplode(col("__v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        // decimal-exact mean (order-independent): round components to
        // DECIMAL(38,6), sum exactly, divide as double — not avg(), whose
        // double partial sums depend on partition merge order
        .agg((sum(col("x").cast("double")
            .cast(org.apache.spark.sql.types.DecimalType(38, 6))).cast("double")
          / count(lit(1))).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"),
          transform(col("pm"), e => e.getField("m").cast("float")).as("__new"))
      // empty cells keep their previous centroid
      cents = cents.join(updated, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("__new"), col("__cent")).as("__cent"))
      cents = cents.sparkSession.createDataFrame(
        cents.collectAsList(), cents.schema) // k rows: pin to driver, cut lineage
    }
    cents.select(col("cell"), col("__cent").as("centroid"))
  }

  /** [[ivfTopK]] with k-means-trained centroids instead of the first-nlist
    * stub: same partition/probe plumbing, better-balanced cells.
    */
  def ivfTopKTrained(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      trainIters: Int = 5
  ): DataFrame = {
    val cents = kmeans(corpus, idCol, vecCol, nlist, trainIters)
      .select(col("cell"), col("centroid").as("__cent"))
    val centArr = centroidArray(cents) // one collect for both sides

    val cAssigned = assignCellsWith(corpus, idCol, "neighbor_id", vecCol, centArr, keep = 1)
    val qProbes = assignCellsWith(queries, idCol, "query_id", vecCol, centArr, keep = nprobe)
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    cAssigned
      .join(broadcast(qProbes), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("__v_query_id"), col("__v_neighbor_id")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Approximate top-k with multi-table LSH: a candidate is scored if it
    * shares a bucket with the query in ANY of the `tables` hash tables —
    * the standard recall amplifier (recall ≈ 1-(1-p^nbits)^tables). Trades
    * recall for scanning only colliding buckets; recall is measured against
    * [[bruteForceTopK]] in tests.
    *
    * Scale shape: the corpus is hashed once (narrow projection, no
    * shuffle), probe rows are corpus_rows × tables exploded pairs joined to
    * the broadcast query buckets, and only collisions are scored. For huge
    * query sets, swap the broadcast for a shuffle join on (table, bucket).
    */
  /** Embedding-space near-duplicate GROUPS: connected components of the
    * vector↔hyperplane-bucket graph — the semantic twin of
    * [[graft.text.MinHash.nearDupGroups]] (same
    * [[graft.operators.ConnectedComponents]] fixpoint, hyperplane buckets
    * instead of MinHash bands). Two vectors land in the same bucket of a
    * table when all `nbits` hyperplane signs agree, i.e. cosine-similar
    * vectors collide (P ≈ (1 - θ/π)^nbits per table); any shared bucket
    * in any table links them, and groups are the transitive closure.
    *
    * Dedup posture is the reverse of ANN search: MORE bits (precision —
    * an unrelated-pair collision fuses two groups; there is deliberately
    * no pairwise verification, which would reintroduce the quadratic pair
    * enumeration) and FEW tables (each extra table only adds recall).
    * Defaults: 16 bits × 2 tables.
    *
    * Linear in vectors × tables at any duplication factor; rounds scale
    * with log(component diameter). Returns (id, group_rep); group_rep is
    * the minimum vec id reachable through shared buckets.
    */
  def semanticDupGroups(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nbits: Int = 16,
      tables: Int = 2,
      maxIters: Int = 25
  ): DataFrame =
    graft.operators.ConnectedComponents
      .labelPropagateWithRounds(
        hyperplaneEdges(corpus, idCol, vecCol, nbits, tables),
        "id", Seq("table", "bucket"), maxIters)._1

  /** vector ↔ hyperplane-bucket membership edges (id, table, bucket) — the
    * semantic twin of [[graft.text.MinHash.bandEdges]]; the unit
    * [[semanticDupGroups]] propagates over, and one of the two signals in
    * multi-signal dedup.
    */
  def hyperplaneEdges(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nbits: Int = 16,
      tables: Int = 2
  ): DataFrame =
    corpus.select(
      col(idCol).as("id"),
      posexplode(lshBuckets(col(vecCol), nbits, tables)).as(Seq("table", "bucket")))

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", arXiv:2303.09540): k-means
    * cluster the embeddings, compute EXACT pairwise cosine only within each
    * cluster, group transitively above `tau`, and keep per group the member
    * with the LOWEST similarity to its cluster centroid (the paper's rule —
    * the kept example is the group's outlier, preserving diversity; ties
    * break on id).
    *
    * This is the cluster-scoped exact complement of [[semanticDupGroups]]
    * (hyperplane LSH, probabilistic, no pairwise verification): the paper's
    * point is that clustering bounds the quadratic — pair cost is
    * Σ|cell|² ≈ n²/k, embarrassingly parallel across cells, instead of n².
    * At 10⁹ vectors pick k so the largest cell's pair block fits an
    * executor (k ≈ n/50k keeps cells ~50k ⇒ ~1.25G pairs/cell-group,
    * sharded by the join); `maxCellSize` guards the adversarial case where
    * k-means collapses onto a near-duplicate corpus — oversized cells are
    * hash-split into sub-cells so no pair block exceeds ~maxCellSize²,
    * trading recall only inside the split cells (see the inline note);
    * every other step is the trained-IVF machinery
    * ([[kmeans]] broadcast argmax assignment — the corpus never shuffles
    * to learn its cell — plus one groupBy for the keep rule).
    *
    * Deterministic and engine-portable end to end (portable k-means seeds,
    * decimal-exact centroid means, sequential-fold cosines, id tiebreaks),
    * so the whole path — training included — hash-checks against a DuckDB
    * mirror (q_semdedup). Since each vector is assigned exactly one cell
    * and pairs are within-cell, every dup group lives inside one cell.
    *
    * @return one row per corpus vector:
    *         (id, cell, simc = cosine(vec, its centroid), group_rep, kept)
    */
  def semDedup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 8,
      trainIters: Int = 2,
      tau: Double = 0.3,
      maxIters: Int = 25,
      maxCellSize: Int = 50000
  ): DataFrame = {
    val cents = kmeans(corpus, idCol, vecCol, k, trainIters)
      .select(col("cell"), col("centroid").as("__cent"))
    val centArr = centroidArray(cents)
    val assigned = corpus
      .select(col(idCol).as("id"), col(vecCol).as("__v"))
      .withColumn("cell", element_at(nearestCells(col("__v"), centArr, 1), 1))
      .join(broadcast(cents), Seq("cell")) // k rows: the centroid vector back
      .withColumn("simc", cosine(col("__v"), col("__cent")))
      .select("id", "__v", "cell", "simc")
    // HOT-CELL GUARD: the within-cell pair join is n_cell² — if k-means
    // collapses (a near-duplicate corpus, exactly the input a dedup op
    // sees), one cell can hold ~n vectors and the quadratic is unbounded.
    // Cells above `maxCellSize` are split into ceil(n_cell/maxCellSize)
    // sub-cells by an id hash, capping any pair block at ~maxCellSize²
    // (same posture as the as-of skew bucketing, `leftAsofBucketed`).
    // Recall trade, documented: pairs across sub-cells of one hot cell are
    // not compared, so a dup group spanning sub-cells may split — bounded
    // wall is bought with recall ONLY on cells the guard touches; cells
    // under the cap (all cells, on normal data with the default) are
    // exact and the output is bit-identical to the unguarded op.
    // `sizes` has ≤ k rows (one per cell) — broadcast, no extra shuffle
    // of the corpus: sub-cell assignment stays a narrow map.
    val sizes = assigned.groupBy("cell").agg(count(lit(1)).as("__cn"))
    val sub = assigned.join(broadcast(sizes), Seq("cell"))
      .withColumn("__nsub",
        ceil(col("__cn").cast("double") / lit(maxCellSize.toDouble)).cast("int"))
      .withColumn("subcell",
        when(col("__nsub") <= 1, lit(0))
          .otherwise(pmod(xxhash64(col("id")), col("__nsub").cast("long")).cast("int")))
    // exact pairwise cosine WITHIN each (cell, subcell) — the bounded quadratic
    val a = sub.select(col("cell"), col("subcell"), col("id").as("pa"), col("__v").as("__va"))
    val b = sub.select(col("cell"), col("subcell"), col("id").as("pb"), col("__v").as("__vb"))
    val pairs = a.join(b, Seq("cell", "subcell"))
      .filter(col("pa") < col("pb"))
      .filter(cosine(col("__va"), col("__vb")) >= tau)
      .select("pa", "pb")
    // transitive closure: each qualifying pair is a 2-member "bucket" in the
    // shared components fixpoint. Both directions come out of ONE explode —
    // a two-branch union would run the quadratic pair join twice when the
    // fixpoint materializes its persisted edge frame (exchange reuse covers
    // the shuffles, not the join probe + cosine filter).
    val edges = pairs
      .select(explode(array(col("pa"), col("pb"))).as("id"), col("pa"), col("pb"))
    val labels = graft.operators.ConnectedComponents
      .labelPropagateWithRounds(edges, "id", Seq("pa", "pb"), maxIters)._1
    val labeled = assigned
      .join(labels, Seq("id"), "left")
      .select(col("id"), col("cell"), col("simc"),
        coalesce(col("group_rep"), col("id")).as("group_rep"))
    // keep rule: argmin (simc, id) per group — min_by on the pair struct is
    // partial-aggregatable (no window sort); singletons keep themselves
    val keeper = labeled.groupBy("group_rep")
      .agg(min_by(col("id"), struct(col("simc"), col("id"))).as("__keep_id"))
    labeled.join(keeper, Seq("group_rep"))
      .select(col("id"), col("cell"), col("simc"), col("group_rep"),
        (col("id") === col("__keep_id")).as("kept"))
  }

  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nbits: Int = 6,
      tables: Int = 8
  ): DataFrame = {
    val c = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        posexplode(lshBuckets(col(vecCol), nbits, tables)).as(Seq("table", "bucket")))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        posexplode(lshBuckets(col(vecCol), nbits, tables)).as(Seq("table", "bucket")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id", "__qv", "__cv")
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }
}
