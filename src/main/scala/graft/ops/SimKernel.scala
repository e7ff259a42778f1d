package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity kernels over embedding frames (vec_id, v: array<double>, nrm).
  *
  * The declared cosine is `aggregate(zip_with(va, vb, _*_), 0d, _+_) /
  * (na * nb)` — a sequential left fold in index order. Both kernels compute
  * the IDENTICAL float operation sequence, so results are bit-identical to
  * the declarative form:
  *   - `scoreAgainstQueries` is a declarative broadcast join whose dot runs
  *     through the codegen `graft_dot` Expression (primitive loop inside
  *     whole-stage codegen);
  *   - `cosinePairs` runs the same primitive loop in a cogroup kernel.
  *
  * Scale design (no driver-side collect anywhere):
  *   - all-pairs is BLOCK-PARTITIONED: vectors are assigned to id-derived
  *     blocks, every block pair (i <= j) becomes a shuffle key, and each
  *     cogroup task sees exactly two blocks — per-task memory is bounded by
  *     the block size (tune `blocks` ≈ n / rows-per-task at 100 TB), total
  *     shuffle volume is n·(blocks+1) rows, and no executor or the driver
  *     ever holds the corpus;
  *   - query scoring broadcasts only the (small) query side and streams the
  *     corpus linearly.
  */
object SimKernel {
  /** Block-partitioned all-pairs scaffolding, shared by the cosine kernel
    * here and the bitmap-Jaccard kernel in LlmPipeline. Each element with
    * id-derived block b is the A-side of block-pair keys (b, j >= b) and the
    * B-side of keys (i <= b, b), so every unordered element pair meets in
    * EXACTLY one cogroup: cross-block pairs in their (minBlock, maxBlock)
    * key; same-block pairs deduped by the id order guard. `pairFn` sees
    * (a, b) exactly once per unordered pair (canonicalize ids inside it).
    * Per-task memory is two blocks; total shuffle is n·(blocks+1) rows —
    * sizing rule for `blocks` in SCALE_TUNING.md. */
  def blockAllPairs[T, R](ds: Dataset[T], blocks: Int)(idOf: T => Long)(
      pairFn: (T, T) => Option[R])(
      implicit keyedEnc: Encoder[(Int, T)], rEnc: Encoder[R],
      ct: scala.reflect.ClassTag[T]): Dataset[R] = {
    val aSide = ds.flatMap { t =>
      val b = (idOf(t) % blocks).toInt
      (b until blocks).map(j => (b * blocks + j, t))
    }
    val bSide = ds.flatMap { t =>
      val b = (idOf(t) % blocks).toInt
      (0 to b).map(i => (i * blocks + b, t))
    }
    aSide.groupByKey(_._1)(Encoders.scalaInt)
      .cogroup(bSide.groupByKey(_._1)(Encoders.scalaInt)) { (key, as, bs) =>
        val same = (key / blocks) == (key % blocks)
        val bArr = bs.map(_._2).toArray // one block — bounded by construction
        as.flatMap { a =>
          val av = a._2
          bArr.iterator.flatMap { bv =>
            if (same && idOf(bv) <= idOf(av)) None else pairFn(av, bv)
          }
        }
      }
  }

  /** All pairs (vid_a < vid_b) with cosine >= threshold, block-partitioned.
    * Input frame: (vec_id: Long, v: array<double>, nrm: double). */
  def cosinePairs(s: SparkSession, vecs: DataFrame, threshold: Double,
                  blocks: Int = 16): DataFrame = {
    import s.implicits._
    val ds = vecs.selectExpr("vec_id", "v", "nrm").as[(Long, Array[Double], Double)]
    blockAllPairs(ds, blocks)(_._1) { case ((ida, va, na), (idb, vb, nb)) =>
      val cos = dot(va, vb) / (na * nb)
      if (cos >= threshold) Some((math.min(ida, idb), math.max(ida, idb), cos))
      else None
    }.toDF("vid_a", "vid_b", "cos")
  }

  /** For every query (small broadcast side), cosine against every corpus
    * vector except itself. Returns (qid, vid, cos) — rank/top-k downstream.
    * Declarative: BroadcastNestedLoopJoin + the codegen `graft_dot`. */
  def scoreAgainstQueries(s: SparkSession, corpus: DataFrame, queries: DataFrame): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("v").as("va"), col("nrm").as("na"))
    val c = corpus.select(col("vec_id").as("vid"), col("v").as("vb"), col("nrm").as("nb"))
    c.join(broadcast(q), col("qid") =!= col("vid"))
      .select(col("qid"), col("vid"),
        (expr("graft_dot(va, vb)") / (col("na") * col("nb"))).as("cos"))
  }

  /** Sequential dot product — the same op order as the declared fold (and as
    * `graft_dot`'s codegen loop). */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var i = 0; var acc = 0.0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }
}
