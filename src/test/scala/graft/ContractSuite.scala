package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: key alignment between `queries` and
  * `oracleSql`, and schema sanity for the hashed parquet outputs. */
class ContractSuite extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  test("every oracle key has a query; only documented omissions lack an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle keys without a query: ${o -- q}")
    val documentedOmissions = Set("agg_approx_distinct", "agg_approx_percentile")
    assert((q -- o) == documentedOmissions,
      s"undocumented oracle omissions: ${(q -- o) -- documentedOmissions}")
  }

  test("no output schema has duplicate, empty, or nested-unhashable columns") {
    val allowedNested = Set.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val schema = fn(s, d).schema
      val names = schema.fields.map(_.name).toSeq
      assert(names.distinct == names, s"$name: duplicate column names $names")
      assert(names.forall(_.nonEmpty), s"$name: empty column name")
      schema.fields.foreach { f =>
        val t = f.dataType.typeName
        assert(!Set("struct", "array", "map").contains(t) || allowedNested.contains(name),
          s"$name.${f.name}: nested type $t would not hash-compare cleanly")
      }
    }
  }

  test("entry runs in a plain session-independent way (no extension functions)") {
    // entry must work in the DRIVER's own session, which lacks GraftExtensions;
    // approximate that by checking the plan has no graft_dot reference.
    val plan = SparkEntry.entry(s).queryExecution.analyzed.toString()
    assert(!plan.contains("graft_dot"))
  }
}
