package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

import graft.Tables
import graft.pipeline.Scd2

/** Round-8 event/relational analytics: SCD2 dimension versioning + the
  * temporal (point-in-time) join (Flink's `FOR SYSTEM_TIME AS OF`),
  * sliding distinct counts, dead-letter routing of corrupt records,
  * and key-skew diagnostics.
  *
  * Same contract as [[ReferenceQueries]]: every query has a DuckDB
  * oracle with identical column names and total ordering; timestamps
  * stay ns-epoch longs (`Tables.load` normalization); doubles fold to
  * integer micro/cents before any cross-engine sum.
  */
object AnalyticsQueries {

  private def events(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  /** q127/q128's dimension-change stream: signup events as profile
    * updates. Times are collapsed per (user, ts) first (greatest value
    * wins — [[graft.pipeline.AsofJoin]]'s tie-break) so the SCD2
    * intervals are well defined even if two changes share an exact ns
    * timestamp.
    */
  private def dimChanges(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .where(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("attr"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // q127 — SCD2 BUILD: the signup change stream versioned into
    // half-open validity intervals per user (the warehouse
    // dimension-table shape; Iceberg/Delta users materialize exactly
    // this from CDC feeds before point-in-time joins). One key
    // shuffle + a lead() window bounded by per-user version count —
    // see Scd2.build for the scale argument. `attr` rounds at 6 dp
    // (single stored double, no arithmetic accumulation).
    "q127_scd2_build" -> ((s, d) =>
      Scd2.build(dimChanges(s, d), "user_id", "ts", Seq("attr"))
        .select(col("user_id"), round(col("attr"), 6).as("attr"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy("user_id", "valid_from")),

    // q128 — TEMPORAL JOIN (point-in-time): every purchase enriched
    // with the profile version valid at purchase time. Planned as
    // union + carry-forward (ONE key shuffle, no interval range
    // join — Scd2.temporalJoin documents why that is safe); the
    // ORACLE deliberately computes the INTERVAL form (valid_from <=
    // t < valid_to over the SQL-built SCD2) so the gate proves the
    // as-of rewrite ≡ interval semantics, purchases before any
    // version keeping NULL attrs.
    "q128_temporal_join" -> ((s, d) => {
      val facts = events(s, d)
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      Scd2.temporalJoin(facts, dimChanges(s, d), "user_id",
          col("ts"), col("ts"), "attr")
        .select(col("event_id"), col("user_id"), col("ts"),
          round(col("attr"), 6).as("attr"))
        .orderBy("event_id")
    }),

    // q132 — ROLLING 7-DAY DISTINCT USERS (sliding-window distinct):
    // the weekly-active metric. Distinct-over-a-sliding-frame has no
    // partial aggregate, so the scalable shape is: collapse to
    // distinct (user, day) FIRST (one partial-agg shuffle — the only
    // one that sees event volume), then fan each row out to the <= 7
    // window days it contributes to (bounded ×7, the q44 sliding
    // expansion in batch), then count-distinct per window day. The
    // observed-days filter broadcasts (|days| rows). The oracle is
    // the direct interval-join formulation — independent of the
    // fan-out trick.
    "q132_rolling_distinct" -> ((s, d) => {
      val ud = events(s, d)
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
        .distinct()
      val days = ud.select(col("day")).distinct()
      ud.select(col("user_id"),
          explode(sequence(col("day"), col("day") + 6)).as("day"))
        .join(broadcast(days), "day")
        .groupBy("day")
        .agg(countDistinct("user_id").as("dau7"))
        .orderBy("day")
    }),

    // q134 — DEAD-LETTER ROUTING: malformed records diverted, never
    // dropped silently, never failing the job — the ingest contract
    // every production pipeline needs (Flink side outputs / Kafka
    // Connect DLQ topics). A deterministic corruption (event_id % 7
    // == 3 prepends garbage) makes the fixture self-describing: the
    // REAL `from_json` PERMISSIVE parse with
    // columnNameOfCorruptRecord must route exactly the constructed-
    // bad lines to 'dlq' and parse every other line — the oracle
    // recomputes the routing from the construction rule alone, so a
    // parser that accepts a malformed line (or rejects a valid one)
    // hash-mismatches. Pure scan-side; one bounded 2-row rollup.
    "q134_dlq_routing" -> ((s, d) => {
      val raw = events(s, d).select(
        col("event_id"),
        when(col("event_id") % 7 === 3,
          concat(lit("{bad"), col("props")))
          .otherwise(to_json(struct(col("event_id"),
            expr("try_cast(get_json_object(props, '$.k') AS INT)").as("k"))))
          .as("line"))
      val schema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("k", IntegerType),
        StructField("_corrupt", StringType)))
      val opts = Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt")
      raw
        .select(from_json(col("line"), schema, opts).as("r"))
        .select(
          when(col("r._corrupt").isNotNull, "dlq").otherwise("ok").as("route"),
          col("r.k").as("k"))
        .groupBy("route")
        .agg(count(lit(1)).as("n"), sum("k").as("k_sum"))
        .orderBy("route")
    }),

    // q135 — KEY-SKEW DIAGNOSTIC: the distribution report that decides
    // salting/AQE-skew settings before a big shuffle — per-key counts
    // reduced to max/min/percentiles and a max-vs-mean skew ratio.
    // Per-key counts are one partial-agg pass; every statistic runs on
    // the |keys|-row aggregate. All-integer arithmetic (ratio in
    // micro units via exact integer division; percentiles hit exact
    // ranks on |keys| values) keeps both engines bit-identical.
    "q135_skew_stats" -> ((s, d) => {
      val cnt = events(s, d).groupBy("user_id").agg(count(lit(1)).as("c"))
      cnt.agg(
          count(lit(1)).as("n_keys"),
          sum("c").as("total"),
          max("c").as("max_c"),
          min("c").as("min_c"),
          floor(expr("percentile(c, 0.5)") * 1000000).cast("long").as("p50_micro"),
          floor(expr("percentile(c, 0.9)") * 1000000).cast("long").as("p90_micro"))
        .withColumn("skew_micro",
          expr("(max_c * n_keys * 1000000) div total"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q127_scd2_build" ->
      ("WITH ch AS (SELECT user_id, epoch_ns(ts) AS t, max(value) AS attr " +
        "FROM events WHERE event_type = 'signup' GROUP BY 1, 2) " +
        "SELECT user_id, round(attr, 6) AS attr, t AS valid_from, " +
        "lead(t) OVER (PARTITION BY user_id ORDER BY t) AS valid_to, " +
        "lead(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL AS is_current " +
        "FROM ch ORDER BY user_id, valid_from"),
    // the INTERVAL formulation on purpose — proves the engine's as-of
    // rewrite implements point-in-time semantics (see q128's comment)
    "q128_temporal_join" ->
      ("WITH ch AS (SELECT user_id, epoch_ns(ts) AS t, max(value) AS attr " +
        "FROM events WHERE event_type = 'signup' GROUP BY 1, 2), " +
        "v AS (SELECT user_id, attr, t AS vf, " +
        "lead(t) OVER (PARTITION BY user_id ORDER BY t) AS vt FROM ch), " +
        "f AS (SELECT event_id, user_id, epoch_ns(ts) AS t FROM events " +
        "WHERE event_type = 'purchase') " +
        "SELECT f.event_id, f.user_id, f.t AS ts, round(v.attr, 6) AS attr " +
        "FROM f LEFT JOIN v ON f.user_id = v.user_id " +
        "AND v.vf <= f.t AND (v.vt IS NULL OR f.t < v.vt) " +
        "ORDER BY event_id"),
    // direct interval-join formulation, independent of the ×7 fan-out
    "q132_rolling_distinct" ->
      ("WITH ud AS (SELECT DISTINCT user_id, " +
        "epoch_ns(ts) // 86400000000000 AS day FROM events), " +
        "days AS (SELECT DISTINCT day FROM ud) " +
        "SELECT d.day, count(DISTINCT u.user_id) AS dau7 " +
        "FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day " +
        "GROUP BY d.day ORDER BY d.day"),
    // routing recomputed from the corruption rule alone: the gate
    // checks the REAL parser accepts exactly the well-formed lines
    "q134_dlq_routing" ->
      ("SELECT CASE WHEN event_id % 7 = 3 THEN 'dlq' ELSE 'ok' END AS route, " +
        "count(*) AS n, " +
        "sum(CASE WHEN event_id % 7 <> 3 " +
        "THEN TRY_CAST(json_extract_string(props, '$.k') AS INT) END) AS k_sum " +
        "FROM events GROUP BY 1 ORDER BY route"),
    "q135_skew_stats" ->
      ("WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1) " +
        "SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS total, " +
        "max(c) AS max_c, min(c) AS min_c, " +
        "CAST(floor(quantile_cont(c, 0.5) * 1000000) AS BIGINT) AS p50_micro, " +
        "CAST(floor(quantile_cont(c, 0.9) * 1000000) AS BIGINT) AS p90_micro, " +
        "CAST(max(c) * count(*) * 1000000 // CAST(sum(c) AS BIGINT) AS BIGINT) " +
        "AS skew_micro FROM c"))
}
