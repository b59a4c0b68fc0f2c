package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.Tables
import graft.operators.{Dedup, Sampling}
import graft.text.{CorpusOps, MinHash, TextFunctions}

/** End-to-end composition of the LLM-data pipeline: quality gate → exact
  * dedup → near-dup group dedup → duplicate-span removal → benchmark
  * decontamination → train/val/test split, chained through the operators'
  * public APIs over the real documents table. Every stage is individually
  * DuckDB-oracled by the driver; what only this spec checks is that the
  * stages COMPOSE — each consumes the previous stage's actual output
  * schema — and the cross-stage invariants no per-stage oracle can see:
  * dedup idempotence (a second pass finds nothing), span-removal token
  * accounting, seeded contamination leaving exactly, and the split being
  * a partition of the surviving corpus.
  */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("quality -> exact dedup -> near-dup dedup -> span removal -> decontaminate -> split composes with stable invariants") {
    val docs = Tables.documents(spark, dir)
    val total = docs.count()
    assert(total === 500L)

    // ---- stage 1: quality gate (cheap length filter; the full battery
    // is oracled as q_quality_filter/q_c4_filter) ----
    val quality = docs.filter(TextFunctions.tokenCount(col("text")) >= 5)
    val nQuality = quality.count()
    assert(nQuality > 0L && nQuality <= total)

    // ---- stage 2: exact dedup (byte-identical text) ----
    val keepExact = Dedup.exactText(quality, "text", "doc_id")
      .select(col("keep_id").as("doc_id"))
    val exact = quality.join(keepExact, Seq("doc_id"), "left_semi")
    val nExact = exact.count()
    assert(nExact === exact.select("text").distinct().count(),
      "exact dedup must leave pairwise-distinct texts")
    // idempotent: a second exact pass keeps everything
    assert(Dedup.exactText(exact, "text", "doc_id")
      .agg(max(col("dup_count"))).head().getLong(0) === 1L)

    // ---- stage 3: near-dup group dedup (keep each group's rep) ----
    val labels = MinHash.nearDupGroups(exact, "doc_id", "text")
    assert(labels.count() === nExact, "every doc gets exactly one label")
    val near = exact.join(
      labels.filter(col("id") === col("group_rep")).select(col("id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val nNear = near.count()
    assert(nNear <= nExact)
    // idempotent: shingle/band hashes are deterministic, so two kept reps
    // (different components) still share no bucket — all singletons
    val relabeled = MinHash.nearDupGroups(near, "doc_id", "text")
    assert(relabeled.filter(col("id") =!= col("group_rep")).count() === 0L,
      "near-dup dedup must be a fixpoint of itself")

    // ---- stage 4: duplicate-span removal over the survivors ----
    val cleaned = CorpusOps.removeDupSpans(near, "doc_id", "text")
    assert(cleaned.count() === nNear)
    // token accounting: cleaned text holds exactly n_tokens - n_removed
    val broken = cleaned.filter(
      TextFunctions.tokenCount(col("cleaned_text")).cast("long")
        =!= (col("n_tokens") - col("n_removed"))).count()
    assert(broken === 0L, "cleaned_text token count must equal n_tokens - n_removed")
    val corpus = near.select("doc_id", "lang")
      .join(cleaned.select(col("id").as("doc_id"), col("cleaned_text").as("text")),
        Seq("doc_id"))
    assert(corpus.count() === nNear)

    // ---- stage 5: decontamination against a seeded benchmark ----
    // benchmark = verbatim copies of 5 surviving docs -> guaranteed hits
    val seeds = corpus.orderBy("doc_id").limit(5)
      .select(col("doc_id"), col("text")).collect()
    val bench = seeds.map(r => (r.getLong(0) + 1000000L, r.getString(1)))
      .toSeq.toDF("doc_id", "text")
    val decon = MinHash.decontaminate(corpus, bench, "doc_id", "text")
    val seedIds = seeds.map(_.getLong(0)).toSet
    val survivors = decon.select("doc_id").as[Long].collect().toSet
    assert(seedIds.intersect(survivors).isEmpty,
      "verbatim benchmark copies must be removed")
    // anti-join semantics: output is a subset of the input corpus
    assert(decon.count() + seedIds.size <= nNear)
    assert(decon.join(corpus, Seq("doc_id"), "left_anti").count() === 0L)

    // ---- stage 6: deterministic train/val/test split ----
    val split = decon.withColumn("split",
      Sampling.splitLabel(col("doc_id"), trainPm = 800, valPm = 100))
    val byLabel = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byLabel.keySet.subsetOf(Set("train", "val", "test")))
    assert(byLabel.values.sum === decon.count(),
      "split labels must partition the corpus")
    // deterministic: same key -> same label on a re-run
    val again = decon.withColumn("split2",
      Sampling.splitLabel(col("doc_id"), trainPm = 800, valPm = 100))
    assert(split.join(again, Seq("doc_id"))
      .filter(col("split") =!= col("split2")).count() === 0L)
  }
}
