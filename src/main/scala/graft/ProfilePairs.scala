package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the sf10 word-pair memo + its consumer sort. */
object ProfilePairs {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val s = SparkSession.builder().master("local[24]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "24")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.memory.storageFraction", "0.3")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val pairs = t("memo-build")(graft.ops.Shared.wordPairs(s, d))
    println(s"[prof] n_pairs ${t("count")(pairs.count())}")
    t("sort-1")(pairs.orderBy("doc_a", "doc_b").write.format("noop").mode("overwrite").save())
    t("sort-2")(pairs.orderBy("doc_a", "doc_b").write.format("noop").mode("overwrite").save())
    s.stop()
  }
}
