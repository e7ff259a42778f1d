package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Process-lifetime memos of the expensive frames SHARED by several declared
  * ops: the exact word-Jaccard near-dup pair set (`llm_dedup_near`,
  * `llm_dedup_clusters`, `llm_dedup_keep_best`), its connected-component
  * labels (`llm_dedup_clusters`, `llm_dedup_keep_best`), and the normed
  * double-vector frame (every `llm_sim_*` / `llm_dedup_embed` op).
  *
  * Each value is an EAGER `localCheckpoint`: computed once per
  * (SparkContext, sfDir), held as materialized executor blocks, and every
  * consumer plan starts from the scan-free checkpoint. Before this memo the
  * clusters/keep_best/near trio re-derived the same quadratic-output pair
  * computation three times per process (~11.5 s of the r4 bench), and the
  * ANN ops rebuilt the vector subtree 4× inside one plan.
  *
  * At 100 TB this is exactly the "stage result reuse" a production pipeline
  * gets from persisting the dedup pair table once and feeding all downstream
  * consumers from it — the memo makes the declared ops behave like that
  * pipeline while each op stays individually callable (SCALE_TUNING.md,
  * "Shared memo checkpoints").
  *
  * Thread safety: `Verify` dumps queries from a 4-thread pool, so memos use
  * `ConcurrentHashMap.computeIfAbsent` (exactly-once evaluation). One map
  * per kind keeps the nested lookup (labels → pairs) out of same-map
  * reentrancy. Results are unchanged by construction — the memo only
  * replaces recomputation of a deterministic frame with its materialized
  * blocks.
  */
private[ops] object Shared {
  private val pairsCache  = new ConcurrentHashMap[String, DataFrame]
  private val labelsCache = new ConcurrentHashMap[String, DataFrame]
  private val vecsCache   = new ConcurrentHashMap[String, DataFrame]

  private def key(s: SparkSession, d: String): String =
    s.sparkContext.applicationId + "|" + d

  /** Distinct word-token sets per document, sorted so exact verification
    * hits IntersectSize's O(n+m) two-pointer path (cheap; not memoized). */
  def tokenSets(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("doc_id"),
      sort_array(array_distinct(split(col("text"), " "))).as("toks"))

  /** Exact Jaccard ≥ 4/5 word near-dup pairs (doc_a, doc_b, jaccard_bp),
    * UNORDERED — consumers that need the total order sort the checkpointed
    * frame (a sort of the pair set, paid only where declared). */
  def wordPairs(s: SparkSession, d: String): DataFrame =
    pairsCache.computeIfAbsent(key(s, d), _ =>
      LlmPipeline.nearDupPairs(tokenSets(s, d), sorted = false).localCheckpoint(true))

  /** (doc_id, cluster_rep) connected-component labels of the word near-dup
    * pair graph, for every document. */
  def ccLabels(s: SparkSession, d: String): DataFrame = {
    val pairs = wordPairs(s, d) // resolve before entering the labels memo
    labelsCache.computeIfAbsent(key(s, d), _ =>
      graft.Scale.connectedComponents(
        documents(s, d).select("doc_id"), pairs.select("doc_a", "doc_b"))
        .localCheckpoint(true))
  }

  /** Embeddings as (vec_id, v: array<double>, nrm) with the norm through the
    * codegen `graft_dot` (index-order accumulation, bit-identical to the
    * declarative `aggregate` fold the oracle mirrors). */
  def vecs(s: SparkSession, d: String): DataFrame =
    vecsCache.computeIfAbsent(key(s, d), _ =>
      embeddings(s, d).select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
        .localCheckpoint(true))
}
