package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-signal near-duplicate groups: connected components over the UNION
  * of the text LSH bucket graph ([[graft.text.MinHash.bandEdges]]) and the
  * embedding hyperplane bucket graph
  * ([[graft.vector.VectorFunctions.hyperplaneEdges]]) — "duplicates by
  * surface text OR by semantic similarity", transitively. A doc cluster
  * can chain through either signal: boilerplate variants connect via
  * shingles, paraphrases via embeddings, and a mixed family unifies
  * through any shared member.
  *
  * Buckets from the two signals are namespaced by a `kind` column
  * ("b"+band for text, "v"+table for vectors) so they can never collide;
  * a single [[ConnectedComponents]] fixpoint then runs over the combined
  * bipartite graph — same linear cost shape, rounds still bounded by
  * component diameter. Docs lacking one signal (no shingles, or no
  * embedding row) simply contribute no edges of that kind.
  */
object MultiSignalDedup {

  def groups(
      docs: DataFrame,
      docIdCol: String,
      textCol: String,
      embeddings: DataFrame,
      embIdCol: String,
      vecCol: String,
      shingleN: Int = 3,
      k: Int = 16,
      bands: Int = 4,
      nbits: Int = 16,
      tables: Int = 2,
      maxIters: Int = 25
  ): DataFrame = {
    // kind is an INT namespace (text bands at 0..bands-1, vector tables at
    // 2^20+t): grouping keys stay integer so every fixpoint shuffle hashes
    // fixed-width values instead of strings; group membership — and the
    // oracle's recursive closure — is unchanged by the representation
    val textEdges = graft.text.MinHash
      .bandEdges(docs, docIdCol, textCol, shingleN, k, bands)
      .select(col("id"),
        col("band").cast("int").as("kind"), col("bh").as("key"))
    val vecEdges = graft.vector.VectorFunctions
      .hyperplaneEdges(embeddings, embIdCol, vecCol, nbits, tables)
      .select(col("id"),
        (lit(1 << 20) + col("table")).cast("int").as("kind"), col("bucket").as("key"))
    ConnectedComponents
      .labelPropagateWithRounds(textEdges.unionByName(vecEdges),
        "id", Seq("kind", "key"), maxIters)._1
  }
}
