package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule must rewrite size∘array_intersect into the
  * allocation-free IntersectSize, with identical results. */
class IntersectSizeSuite extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def tokens = Tables.documents(s, TestSpark.sf).limit(40)
    .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))

  test("optimizer rewrites size(array_intersect) to intersect_size") {
    val a = tokens.select(col("doc_id").as("da"), col("toks").as("ta"))
    val b = tokens.select(col("doc_id").as("db"), col("toks").as("tb"))
    val df = a.join(b, col("da") < col("db"))
      .select(size(array_intersect(col("ta"), col("tb"))).as("n"))
    val opt = df.queryExecution.optimizedPlan.toString()
    assert(opt.contains("intersect_size"), s"rule did not fire:\n${opt.take(800)}")
  }

  test("intersect_size == size(array_intersect) on real token sets") {
    val a = tokens.select(col("doc_id").as("da"), col("toks").as("ta"))
    val b = tokens.select(col("doc_id").as("db"), col("toks").as("tb"))
    // expr("...") builds ArrayIntersect inside an alias the rule rewrites;
    // compare against a rule-proof reference built from explode + join
    val viaRule = a.join(b, col("da") < col("db"))
      .select(col("da"), col("db"), size(array_intersect(col("ta"), col("tb"))).as("n"))
    val reference = {
      val ea = tokens.select(col("doc_id").as("da"), explode(col("toks")).as("t"))
      val eb = tokens.select(col("doc_id").as("db"), explode(col("toks")).as("t"))
      ea.join(eb, Seq("t")).filter(col("da") < col("db"))
        .groupBy("da", "db").agg(count(lit(1)).cast("int").as("n"))
    }
    val mism = viaRule.join(reference, Seq("da", "db"), "full")
      .filter(coalesce(viaRule("n"), lit(0)) =!= coalesce(reference("n"), lit(0)))
    assert(mism.isEmpty, s"mismatches: ${mism.count()}")
  }

  test("intersect_size handles duplicate left elements (distinct semantics)") {
    val sp = s; import sp.implicits._
    val df = Seq((Seq("a", "a", "b", "c"), Seq("a", "c", "d"))).toDF("x", "y")
      .select(expr("size(array_intersect(x, y))").as("n"))
    assert(df.collect().head.getInt(0) == 2)
  }
}
