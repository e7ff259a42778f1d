package graft.ops

import org.apache.spark.sql.functions._
import graft.Norm._
import graft.Tables._

/** Reshaping / format-conversion ETL family: pivot, unpivot, calendar
  * gap-fill, date formatting, schema'd JSON parsing, base64/hex codecs.
  * (The classic "Hadoop utility script" jobs — log reshaping, report
  * pivots, format conversion — as single declarative operators.)
  */
object Reshape {
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  val ops: Map[String, Q] = Map(
    // Wide report: one row per user bucket, one column per event type.
    "reshape_pivot" -> ((s, d) => {
      val base = events(s, d).select(pmod(col("user_id"), lit(5)).as("bucket"), col("event_type"))
        .groupBy("bucket").pivot("event_type", eventTypes).agg(count(lit(1)))
      base.select(col("bucket") +: eventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("bucket")
    }),

    // Long form: one (metric, value) row per measure column.
    "reshape_unpivot" -> ((s, d) =>
      lineitem(s, d)
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
        .limit(50)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "metric", "v")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "metric")),

    // Calendar gap-fill: every day in each user's active span, zeros filled —
    // the sessionized-log densification job.
    "reshape_gapfill" -> ((s, d) => {
      val ev = events(s, d).filter(col("user_id") < 20)
        .select(col("user_id"), date_trunc("day", tsec(col("ts"))).cast("date").as("day"))
      val daily = ev.groupBy("user_id", "day").agg(count(lit(1)).as("n"))
      val cal = ev.groupBy("user_id").agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      cal.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"), coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("user_id", "day")
    }),

    "reshape_date_format" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          date_format(col("o_orderdate"), "dd/MM/yyyy").as("dmy"))
        .orderBy("o_orderkey").limit(50)),

    // Schema'd JSON parsing (from_json → typed struct), not just path extraction.
    "reshape_json_struct" -> ((s, d) =>
      events(s, d)
        .select(col("event_type"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("j"))
        .groupBy("event_type")
        .agg(count(when(col("j.k") > 50, 1)).as("n_high"), max(col("j.k")).as("mx"))
        .orderBy("event_type")),

    "reshape_base64_hex" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          // Spark base64 chunks output with \r\n every 76 chars (MIME style);
          // strip to match DuckDB's unchunked encoding.
          regexp_replace(base64(encode(col("text"), "UTF-8")), "[\\r\\n]", "").as("b64"),
          lower(hex(col("text"))).substr(1, 16).as("hex16"),
          (decode(unbase64(base64(encode(col("text"), "UTF-8"))), "UTF-8") === col("text")).as("roundtrip"))
        .orderBy("doc_id").limit(50)),

    // Inverse of reshape_json_struct: typed columns serialized back to a
    // compact JSON document (the event-sink export shape). Both engines
    // emit unspaced `{"k":v,...}` in struct-declaration order; fields are
    // integer/string only (float repr would differ) and non-null (Spark's
    // to_json drops null fields where DuckDB emits "k":null).
    "reshape_to_json" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          to_json(struct(
            col("event_id").as("id"),
            col("event_type").as("t"),
            col("user_id").as("uid"),
            get_json_object(col("props"), "$.k").cast("int").as("k"))).as("doc"))
        .orderBy("event_id").limit(100)),

    // Time-series resampling to OHLC bars (the financial downsample job,
    // and the general first/last-in-bucket shape): per (event_type, hour):
    // open = value at the earliest (ts, event_id), close at the latest,
    // high/low = max/min — all in integer cents BEFORE aggregation, and
    // open/close through min_by/max_by over the unique (ts_s, event_id)
    // order so ties cannot exist. One partial-aggregatable shuffle.
    "reshape_ohlc" -> ((s, d) =>
      events(s, d)
        .select(col("event_type"),
          date_trunc("hour", tsec(col("ts"))).as("h"),
          tsec(col("ts")).as("ts_s"), col("event_id"),
          money(col("value")).as("cents"))
        .groupBy("event_type", "h")
        .agg(
          min_by(col("cents"), struct(col("ts_s"), col("event_id"))).as("open"),
          max("cents").as("high"),
          min("cents").as("low"),
          max_by(col("cents"), struct(col("ts_s"), col("event_id"))).as("close"),
          count(lit(1)).as("n_trades"))
        .orderBy("event_type", "h")),
  )

  val oracle: Map[String, String] = Map(
    "reshape_pivot" ->
      s"""SELECT user_id % 5 AS bucket,
          ${eventTypes.map(t => s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t").mkString(", ")}
          FROM events GROUP BY 1 ORDER BY bucket""",
    "reshape_unpivot" ->
      """WITH src AS (SELECT * FROM lineitem
                      ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity LIMIT 50)
         SELECT l_orderkey, l_linenumber, l_extendedprice, metric, v FROM (
           SELECT l_orderkey, l_linenumber, l_extendedprice, 'l_quantity' AS metric, l_quantity AS v FROM src
           UNION ALL
           SELECT l_orderkey, l_linenumber, l_extendedprice, 'l_discount', l_discount FROM src
           UNION ALL
           SELECT l_orderkey, l_linenumber, l_extendedprice, 'l_tax', l_tax FROM src)
         ORDER BY l_orderkey, l_linenumber, l_extendedprice, metric""",
    "reshape_gapfill" ->
      """WITH ev AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
                     FROM events WHERE user_id < 20),
              daily AS (SELECT user_id, day, count(*) AS n FROM ev GROUP BY 1, 2),
              cal AS (SELECT user_id,
                             CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
                                                         INTERVAL '1 day')) AS DATE) AS day
                      FROM (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM ev GROUP BY 1))
         SELECT cal.user_id, cal.day, coalesce(daily.n, 0) AS n
         FROM cal LEFT JOIN daily ON cal.user_id = daily.user_id AND cal.day = daily.day
         ORDER BY 1, 2""",
    "reshape_date_format" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS ym,
                strftime(o_orderdate, '%d/%m/%Y') AS dmy
         FROM orders ORDER BY o_orderkey LIMIT 50""",
    "reshape_json_struct" ->
      """SELECT event_type,
                count(CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) > 50 THEN 1 END) AS n_high,
                max(CAST(json_extract(props, '$.k') AS INTEGER)) AS mx
         FROM events GROUP BY event_type ORDER BY event_type""",
    "reshape_base64_hex" ->
      """SELECT doc_id, to_base64(encode(text)) AS b64,
                substring(lower(hex(encode(text))), 1, 16) AS hex16,
                decode(from_base64(to_base64(encode(text)))) = text AS roundtrip
         FROM documents ORDER BY doc_id LIMIT 50""",
    "reshape_to_json" ->
      """SELECT event_id,
                CAST(to_json(struct_pack(
                  id := event_id, t := event_type, uid := user_id,
                  k := CAST(json_extract(props, '$.k') AS INTEGER))) AS VARCHAR) AS doc
         FROM events ORDER BY event_id LIMIT 100""",
    // open/close via the two mirrored row_numbers (the arg_min/arg_max twin).
    "reshape_ohlc" ->
      s"""WITH e AS (SELECT event_type,
                            date_trunc('hour', CAST(date_trunc('second', ts) AS TIMESTAMP)) AS h,
                            CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s, event_id,
                            ${moneySql("value")} AS cents
                     FROM events),
               w AS (SELECT *,
                            row_number() OVER (PARTITION BY event_type, h ORDER BY ts_s, event_id) AS ra,
                            row_number() OVER (PARTITION BY event_type, h ORDER BY ts_s DESC, event_id DESC) AS rd
                     FROM e)
          SELECT event_type, h,
                 max(CASE WHEN ra = 1 THEN cents END) AS open,
                 max(cents) AS high, min(cents) AS low,
                 max(CASE WHEN rd = 1 THEN cents END) AS close,
                 count(*) AS n_trades
          FROM w GROUP BY 1, 2 ORDER BY 1, 2""",
  )
}
