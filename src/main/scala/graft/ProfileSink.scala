package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path
import graft.Norm._
import graft.Tables._

/** Scratch profiler for stream_dsv2_sink's phases (not a declared op). */
object ProfileSink {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val s0 = SparkSession.builder().master("local[24]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "24")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s0.sparkContext.setLogLevel("ERROR")
    val s = s0.newSession()
    s.conf.set("spark.sql.catalog.graftmem", "graft.sources.GraftMemCatalog")
    val tag = "prof" + Math.abs(d.hashCode).toString
    val src = s"/tmp/graft_profsink_src_$tag"
    val ckpt = s"/tmp/graft_profsink_ck_$tag"
    val fs = new Path(ckpt).getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new Path(ckpt), true); fs.delete(new Path(src), true)
    s.sql(s"DROP TABLE IF EXISTS graftmem.evt_$tag")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    t("write-json") {
      events(s, d).select(col("event_id"), col("event_type"), money(col("value")).as("cents"))
        .repartition(4, col("event_id")).write.mode("overwrite").json(src)
    }
    t("stream") {
      val q = s.readStream.schema("event_id LONG, event_type STRING, cents LONG")
        .option("maxFilesPerTrigger", "2").json(src)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(s"graftmem.evt_$tag")
      q.awaitTermination()
    }
    t("readback-census") {
      s.table(s"graftmem.evt_$tag").groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
        .orderBy("event_type").collect().foreach(_ => ())
    }
    s.sql(s"DROP TABLE IF EXISTS graftmem.evt_$tag")
    fs.delete(new Path(ckpt), true); fs.delete(new Path(src), true)
    s0.stop()
  }
}
