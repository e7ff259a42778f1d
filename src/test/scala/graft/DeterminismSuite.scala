package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.5 — every declared query must be byte-identical under different
  * shuffle-partition counts (catches partition-order-dependent results,
  * un-broken ties, and limit-boundary nondeterminism before the driver does).
  */
class DeterminismSuite extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name is shuffle-partition independent") {
      def runWith(parts: Int): Seq[String] = {
        s.conf.set("spark.sql.shuffle.partitions", parts.toString)
        try fn(s, d).collect().map(_.toString).toSeq
        finally s.conf.set("spark.sql.shuffle.partitions", "4")
      }
      val a = runWith(1)
      val b = runWith(7)
      assert(a == b, s"$name differs between 1 and 7 shuffle partitions")
    }
  }
}
