package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Norm._
import graft.Tables._

/** SURVEY.md §2.J — LLM-data-pipeline operators (the north-star extension).
  *
  * Design notes for 100 TB:
  *   - `llm_dedup_near` never materializes the O(n²) pair space: MinHash
  *     signatures (64 hashes) are banded (32 bands × 2 rows) and the shuffle
  *     key is (band, band_hash); only same-bucket candidates are verified
  *     with EXACT token-set Jaccard, so the declared result is exact and
  *     engine-independent (the sketch only affects recall: miss probability
  *     at J=0.8 is (1−0.8²)³² ≈ 6.5e-15 per pair). The Jaccard threshold is
  *     evaluated in integer arithmetic (5·|A∩B| ≥ 4·|A∪B|) — no float
  *     boundary can disagree between engines.
  *   - Cosine ops compute dot/norms in DOUBLE with an explicit sequential
  *     fold, mirrored operation-for-operation in the oracle SQL (DuckDB's
  *     native `list_cosine_similarity` accumulates in float32 and drifts
  *     ~1e-7 — empirically measured, not usable for hash parity).
  *   - `llm_sim_topk` broadcasts the 10 query vectors against the corpus
  *     (BroadcastNestedLoopJoin): linear in corpus size, never quadratic.
  *   - tf-idf / wordcount / ngrams are explode → partial-aggregatable
  *     groupBys; top-k always orders by (metric, unique key) after rounding
  *     so limit boundaries are deterministic.
  */
object LlmPipeline {
  /** Distinct-token sets per document (the dedup universe). */
  private def tokenSets(s: SparkSession, d: String, cap: Option[Int] = None): DataFrame = {
    val base = cap.fold(documents(s, d))(c => documents(s, d).filter(col("doc_id") < c))
    base.select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
  }

  /** Embeddings as double vectors with precomputed norm (sequential fold). */
  private def vecs(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", expr("sqrt(aggregate(v, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x))"))

  /** MinHash-LSH near-dup over any (doc_id, toks) frame: 64 hashes banded as
    * 32 bands × 2 rows generate candidates (shuffle key = (band, bh), never a
    * pair), then EXACT integer-arithmetic Jaccard >= 0.8 verifies. Public so
    * the ScalaCheck recall property can drive it with generated corpora.
    *
    * Signatures are computed in a tight per-partition loop (deterministic
    * murmur-based hashes) — their values are internal pruning state and never
    * reach the declared result, so they don't need a cross-engine twin.
    * Verification joins candidates back to the token sets; the exact Jaccard
    * (integer intersect/union, one double division) is what the oracle
    * recomputes over all pairs.
    */
  def nearDupPairs(tokens: DataFrame): DataFrame = {
    val s = tokens.sparkSession
    import s.implicits._
    val tokDs = tokens.as[(Long, Seq[String])]
    // 1. Per-doc 64-hash MinHash signature folded into 32 band keys.
    val bands = tokDs.flatMap { case (id, toks) =>
      val sig = Array.fill(64)(Long.MaxValue)
      toks.foreach { t =>
        var i = 0
        while (i < 64) {
          val h = (scala.util.hashing.MurmurHash3.stringHash(t, i).toLong << 32) ^
            (scala.util.hashing.MurmurHash3.stringHash(t, i + 7919) & 0xffffffffL)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      (0 until 32).map(b => (b, sig(2 * b) * 1000003L ^ sig(2 * b + 1), id))
    }.toDF("band", "bh", "doc_id")
    // (no persist: ReuseExchange already shares the signature subplan
    // between both sides of the self-join within one action)
    // 2. Candidate pairs = same-(band, bh) doc pairs, deduped. This is the
    //    only shuffle that scales with corpus size — never an n² join.
    val ca = bands.select(col("band"), col("bh"), col("doc_id").as("doc_a"))
    val cb = bands.select(col("band").as("band_b"), col("bh").as("bh_b"), col("doc_id").as("doc_b"))
    val cand = ca.join(cb,
        col("band") === col("band_b") && col("bh") === col("bh_b") &&
        col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    // 3. Exact verification in one per-partition pass against the token sets
    //    (broadcast here; at 100 TB this becomes two shuffle joins on doc id
    //    with identical semantics).
    val bcToks = s.sparkContext.broadcast(
      tokDs.collect().map { case (id, t) => (id, t.toSet) }.toMap)
    cand.as[(Long, Long)].map { case (a, b) =>
      val ta = bcToks.value(a); val tb = bcToks.value(b)
      val inter = ta.count(tb.contains)
      (a, b, inter, ta.size + tb.size - inter)
    }.toDF("doc_a", "doc_b", "inter", "uni")
      .filter(col("inter") * 5 >= col("uni") * 4)
      // Basis points via integer floor division: inter/uni is a small-
      // denominator rational, so decimal rounding can tie (and engines
      // disagree on ties); integer arithmetic cannot.
      .select(col("doc_a"), col("doc_b"),
        expr("(CAST(inter AS BIGINT) * 10000) div uni").as("jaccard_bp"))
      .orderBy("doc_a", "doc_b")
  }

  /** DuckDB twin of the double-precision cosine, operation-for-operation. */
  private def cosSql(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""

  val ops: Map[String, Q] = Map(
    "llm_dedup_exact" -> ((s, d) =>
      documents(s, d)
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc_id"))
        .filter(col("n_docs") > 1)
        .orderBy("h")),

    "llm_dedup_near" -> ((s, d) =>
      nearDupPairs(tokenSets(s, d, Some(1000)))),

    "llm_sim_cosine_pairs" -> ((s, d) =>
      SimKernel.cosinePairs(s, vecs(s, d), 0.5)
        .select(col("vid_a"), col("vid_b"), d4(col("cos")).as("cosine"))
        .orderBy("vid_a", "vid_b")),

    "llm_sim_topk" -> ((s, d) =>
      SimKernel.scoreAgainstQueries(s, vecs(s, d), vecs(s, d).filter(col("vec_id") < 10))
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("vid"), d4(col("cos")).as("cosine"), col("rank"))
        .orderBy("qid", "rank")),

    "llm_text_wordcount" -> ((s, d) =>
      documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50)),

    "llm_text_tfidf" -> ((s, d) => {
      val terms = documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
      val docLen = terms.groupBy("doc_id").agg(count(lit(1)).as("len"))
      val df = terms.select("doc_id", "term").distinct()
        .groupBy("term").agg(count(lit(1)).as("df"))
      val n = documents(s, d).agg(count(lit(1)).as("n_docs"))
      tf.join(docLen, "doc_id").join(broadcast(df), "term").crossJoin(broadcast(n))
        .withColumn("score_r", d6(
          (col("cnt").cast("double") / col("len")) *
            log(col("n_docs").cast("double") / col("df"))))
        .select(col("doc_id"), col("term"), col("score_r"))
        .orderBy(col("score_r").desc, col("doc_id"), col("term"))
        .limit(100)
    }),

    "llm_text_ngrams" -> ((s, d) =>
      documents(s, d)
        .select(explode(expr(
          """transform(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
                       (x, i) -> concat(x, ' ', split(text, ' ')[i + 1]))"""))
          .as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(50)),

    "llm_lang_profile" -> ((s, d) => {
      val perDoc = documents(s, d).groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), d4(avg("n_chars")).as("avg_chars"))
      val perTok = documents(s, d)
        .select(col("lang"), col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "source")
        .agg(countDistinct("tok").as("n_distinct_toks"))
      perDoc.join(perTok, Seq("lang", "source"))
        .orderBy("lang", "source")
    }),
  )

  val oracle: Map[String, String] = Map(
    "llm_dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS n_docs, min(doc_id) AS min_doc_id
         FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY h""",
    // Exact all-pairs Jaccard — no sketch — over the same capped universe;
    // integer cross-multiplication keeps the threshold float-free.
    "llm_dedup_near" ->
      s"""WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
                     FROM documents WHERE doc_id < 1000)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 (CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) * 10000)
                   // (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jaccard_bp
          FROM t a JOIN t b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.toks, b.toks)) * 5
                >= (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) * 4
          ORDER BY doc_a, doc_b""",
    "llm_sim_cosine_pairs" ->
      s"""SELECT a.vec_id AS vid_a, b.vec_id AS vid_b,
          ${d4Sql(cosSql("a.embedding", "b.embedding"))} AS cosine
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.5
          ORDER BY vid_a, vid_b""",
    "llm_sim_topk" ->
      s"""SELECT qid, vid, cosine, rank FROM (
            SELECT q.vec_id AS qid, c.vec_id AS vid,
                   ${d4Sql(cosSql("q.embedding", "c.embedding"))} AS cosine,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY ${cosSql("q.embedding", "c.embedding")} DESC, c.vec_id) AS rank
            FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
          WHERE rank <= 5 ORDER BY qid, rank""",
    "llm_text_wordcount" ->
      """SELECT token, count(*) AS n
         FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
         GROUP BY token ORDER BY n DESC, token LIMIT 50""",
    "llm_text_tfidf" ->
      s"""WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
               tf AS (SELECT doc_id, term, count(*) AS cnt FROM terms GROUP BY 1, 2),
               dl AS (SELECT doc_id, count(*) AS len FROM terms GROUP BY 1),
               df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
               n AS (SELECT count(*) AS n_docs FROM documents)
          SELECT tf.doc_id, tf.term,
                 ${d6Sql("(CAST(cnt AS DOUBLE) / len) * ln(CAST(n_docs AS DOUBLE) / df)")} AS score_r
          FROM tf JOIN dl ON tf.doc_id = dl.doc_id JOIN df ON tf.term = df.term CROSS JOIN n
          ORDER BY score_r DESC, tf.doc_id, tf.term LIMIT 100""",
    "llm_text_ngrams" ->
      """SELECT bigram, count(*) AS n FROM (
           SELECT concat(w1, ' ', w2) AS bigram FROM (
             SELECT unnest(toks[1:len(toks) - 1]) AS w1, unnest(toks[2:len(toks)]) AS w2
             FROM (SELECT string_split(text, ' ') AS toks FROM documents)))
         GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50""",
    "llm_lang_profile" ->
      s"""WITH per_doc AS (SELECT lang, source, count(*) AS n_docs,
                                  ${d4Sql("avg(n_chars)")} AS avg_chars
                           FROM documents GROUP BY 1, 2),
               per_tok AS (SELECT lang, source, count(DISTINCT tok) AS n_distinct_toks
                           FROM (SELECT lang, source, unnest(string_split(text, ' ')) AS tok FROM documents)
                           GROUP BY 1, 2)
          SELECT p.lang, p.source, p.n_docs, p.avg_chars, t.n_distinct_toks
          FROM per_doc p JOIN per_tok t ON p.lang = t.lang AND p.source = t.source
          ORDER BY p.lang, p.source""",
  )
}
