package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed training of a linear quality probe — fixed-iteration
  * full-batch gradient descent on hashed token-count features, entirely
  * in e6 fixed-point integer arithmetic, so training is bit-reproducible
  * on any cluster layout and a SQL engine replays the whole loop.
  *
  * The fasttext-style quality classifier of pretraining pipelines
  * (predict "wiki-like?" from bag-of-words) reduced to its linear core:
  * features `x_ij` = token count of doc i in hashed bucket j (m buckets),
  * target `y_e6` ∈ {0, 1e6}, squared loss. Per iteration:
  * `pred_i = Σ_j x_ij·w_j` (w is e6-scaled so the product already is),
  * `grad_j = Σ_i x_ij·(pred_i − y_i)`, `w_j ← w_j − grad_j / (lrDen·n)`
  * — signed integer division truncating toward zero, which Spark `div`,
  * Scala `Long./` and DuckDB `//` all agree on.
  *
  * Scale shape (r18): full-batch squared-loss GD needs the corpus only
  * through two m-bounded sufficient statistics — the Gram matrix
  * `G_jk = Σ_i x_ij·x_ik` and the label moment `b_j = Σ_i x_ij·y_i` —
  * because `grad_j = Σ_i x_ij·(Σ_k x_ik·w_k − y_i) = Σ_k G_jk·w_k − b_j`
  * exactly over the integers (sums of longs are order-independent, so
  * the expansion is bit-identical to the per-doc form it replaces).
  * Both statistics are computed ONCE (a per-doc self-join bounded at
  * ≤ m rows per doc side, partially aggregated map-side) and every
  * gradient iteration is then driver arithmetic on the m×m matrix — the
  * distributed loop of earlier rounds paid two corpus-sized shuffles
  * PER ITERATION for numbers already determined by G and b. The m²-entry
  * collect is a bounded pin like the IVF centroid collect, NOT a
  * data-sized collect (m = 32 ⇒ 1024 longs).
  *
  * Overflow bound: `Σ_k G_jk·w_k = Σ_i x_ij·pred_i` exactly (no abs —
  * both sides are the same signed sum reassociated), so the final
  * gradient value is identical mod 2^64 to the per-doc form's and fits
  * whenever that form's documented n·t·(m·t·W + 1e6) < 2^62 envelope
  * holds; intermediate partial sums may wrap, harmlessly, in
  * two's-complement. G itself is ≤ n·t² per entry. Beyond ~10^8 docs at
  * default sizes, shard into e6-scaled partial means before combining.
  *
  * @return (id, y_e6, score_e6) — final-weight scores for every doc
  */
object LinearProbe {

  def trainScores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      m: Int = 32,
      iters: Int = 3,
      lrDen: Long = 20000L
  ): DataFrame = {
    require(m >= 1 && iters >= 1 && lrDen >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = docs
      .select(col(idCol).as("id"),
        explode(graft.text.TextFunctions.tokens(col(textCol))).as("token"))
      .withColumn("j",
        pmod(graft.text.TextFunctions.polyHash(col("token"), lit(0L)),
          lit(m.toLong)))
      .groupBy("id", "j").agg(count(lit(1)).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val y = docs.select(col(idCol).as("id"),
        when(col(labelCol), lit(1000000L)).otherwise(lit(0L)).as("y_e6"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = y.count()
    // sufficient statistics: one bounded self-join pass for G, one
    // label-join pass for b — the only corpus-sized work of training
    val gram: Map[(Long, Long), Long] = feats
      .join(feats.select(col("id"), col("j").as("k"), col("x").as("xk")), "id")
      .groupBy("j", "k").agg(sum(col("x") * col("xk")).as("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val bvec: Map[Long, Long] = feats
      .join(y, "id")
      .groupBy("j").agg(sum(col("x") * col("y_e6")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val buckets = (0L until m.toLong).toSeq
    var w: Map[Long, Long] = buckets.map(_ -> 0L).toMap
    for (_ <- 1 to iters) {
      // grad_j = Σ_k G_jk·w_k − b_j — exactly the distributed
      // Σ_i x_ij·(pred_i − y_i) of the per-doc form (see scaladoc)
      val grad: Map[Long, Long] = buckets.map { j =>
        val gw = buckets.foldLeft(0L) { (acc, k) =>
          acc + gram.getOrElse((j, k), 0L) * w(k)
        }
        j -> (gw - bvec.getOrElse(j, 0L))
      }.toMap
      w = w.map { case (j, wj) =>
        j -> (wj - grad.getOrElse(j, 0L) / (lrDen * n)) }
    }
    val wDf = w.toSeq.toDF("j", "w_e6")
    // lineage-cut + materialize the final scores so the persisted
    // feature/label frames can be freed before returning
    val out = org.apache.spark.sql.graft.bridge.cutLineage(
      feats.join(broadcast(wDf), "j")
        .groupBy("id").agg(sum(col("x") * col("w_e6")).as("score_e6"))
        .join(y, "id")
        .select(col("id"), col("y_e6"), col("score_e6")))
    out.count()
    feats.unpersist(blocking = false)
    y.unpersist(blocking = false)
    out
  }
}
