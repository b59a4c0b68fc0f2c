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

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

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

  /** Deterministic pseudo-random hyperplane for plane index `p` (globally
    * unique across hash tables: table*nbits + bit): components in [-1, 1],
    * generated driver-side and embedded as a literal so the executor-side
    * lambda is pure arithmetic (no per-evaluation hashing).
    */
  private def plane(p: Int, dim: Int): Seq[Double] = {
    val rnd = new scala.util.Random(1000003L * p + 42)
    Seq.fill(dim)(rnd.nextDouble() * 2 - 1)
  }

  /** Sign-bit bucket id of hash table `table` from `nbits` random
    * hyperplanes (random projection LSH, Charikar 2002). Vectors with small
    * angle land in the same bucket with high probability.
    * `dim` is the (fixed) embedding dimensionality.
    */
  def lshBucket(vec: Column, nbits: Int, dim: Int, table: Int = 0): Column =
    (0 until nbits).map { b =>
      val pl = typedLit(plane(table * nbits + b, dim))
      val bit = when(
        aggregate(
          zip_with(vec, pl, (x, c) => x.cast("double") * c),
          lit(0.0), (acc, v) => acc + v) >= 0,
        lit(1L)).otherwise(lit(0L))
      bit * (1L << (nbits - 1 - b))
    }.reduce(_ + _)

  /** All `tables` bucket ids as an array — one scan computes every table's
    * bucket; the caller explodes it into (table, bucket) probe rows.
    */
  private def lshBuckets(vec: Column, nbits: Int, dim: Int, tables: Int): Column =
    array((0 until tables).map(t => lshBucket(vec, nbits, dim, t)): _*)

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
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nbits: Int = 6,
      tables: Int = 8
  ): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val c = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        posexplode(lshBuckets(col(vecCol), nbits, dim, tables)).as(Seq("table", "bucket")))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        posexplode(lshBuckets(col(vecCol), nbits, dim, tables)).as(Seq("table", "bucket")))
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
