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
  * Scale shape: the feature table is built once and persisted (one
  * explode + groupBy); each iteration is feature-table ⋈ broadcast
  * m-row weights → per-doc partial-agg sum, then ⋈ labels → per-bucket
  * partial-agg grad. The m-row gradient is collected to the driver per
  * iteration — a bounded pin like the IVF centroid collect, NOT a
  * data-sized collect. Two corpus-sized shuffles per iteration, both
  * partially aggregated map-side.
  *
  * Overflow bound: `Σ_i x_ij·|pred_i − y_i| < 2^62` — with per-doc token
  * counts t and |w| ≤ W this is n·t·(m·t·W + 1e6), fine up to ~10^8 docs
  * at default sizes; beyond that, shard the gradient sum into e6-scaled
  * partial means before combining.
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
    var w: Map[Long, Long] = (0L until m.toLong).map(_ -> 0L).toMap
    for (_ <- 1 to iters) {
      val wDf = w.toSeq.toDF("j", "w_e6")
      val pred = feats.join(broadcast(wDf), "j")
        .groupBy("id").agg(sum(col("x") * col("w_e6")).as("pred_e6"))
      val grad = feats.join(pred, "id").join(y, "id")
        .select(col("j"), (col("x") * (col("pred_e6") - col("y_e6"))).as("g"))
        .groupBy("j").agg(sum(col("g")).as("grad"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
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
