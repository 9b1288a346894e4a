package graft.cdc

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Scratch micro-benchmark (Test/runMain graft.cdc.ExtractBench):
  * compares envelope-extraction strategies for CdcSink's hot path on
  * synthetic framed records. Not part of the suite.
  *
  * Measured (local[32], 2M rows, min-of-3 after warmup, 2026-08-13):
  *   A json_tuple chain (current CdcSink shape)   8.3 s/pass
  *   B try_parse_json + variant_get              20.5 s/pass
  *   C get_json_object x5 (pre-round-7 shape)    15.6 s/pass
  * Verdict: the one-pass json_tuple framing+envelope split wins —
  * each record's JSON is tokenized twice total (frame, then env)
  * instead of five times (C) or fully materialized as variant (B).
  */
object ExtractBench {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val n = 2000000
    val env = (1 to 1).map(_ => "x").head // force non-constant
    val df = spark.range(n).select(concat(lit(
      """{"schema":{"type":"struct","fields":[]},"payload":{"before":null,"after":{"user_id":"""),
      col("id"),
      lit("""},"source":{"table":"account","lsn":"""), col("id"),
      lit(""","txId":7},"op":"u"}}""")).as("value")).cache()
    df.count()

    def time(label: String)(body: => Unit): Unit = {
      (1 to 2).foreach(_ => body) // warm
      val t0 = System.nanoTime()
      (1 to 3).foreach(_ => body)
      println(f"$label: ${(System.nanoTime() - t0) / 3e9}%.3f s/pass over $n rows")
    }

    // A: current shape — json_tuple framing + json_tuple env + gjo source
    time("A json_tuple chain") {
      df.select(col("value"),
        json_tuple(col("value"), "schema", "payload").as(Seq("__fs", "__fp")))
        .select(when(col("__fs").isNotNull && col("__fp").isNotNull,
          col("__fp")).otherwise(col("value")).as("__env"))
        .select(json_tuple(col("__env"), "op", "before", "after", "source")
          .as(Seq("__op", "__b", "__a", "__s")))
        .select(col("__op"),
          get_json_object(col("__s"), "$.table").as("__t"),
          expr("try_cast(get_json_object(__s, '$.lsn') AS BIGINT)").as("__l"),
          expr("try_cast(get_json_object(__s, '$.txId') AS BIGINT)").as("__x"),
          when(col("__op") === "d", col("__b")).otherwise(col("__a")).as("__p"))
        .where(col("__op").isNotNull && col("__t").isNotNull && col("__p").isNotNull)
        .write.format("noop").mode("overwrite").save()
    }

    // B: one parse_json -> variant_get everywhere
    time("B variant") {
      df.select(try_parse_json(col("value")).as("v"), col("value"))
        .select(coalesce(
          try_variant_get(col("v"), "$.payload", "variant"), col("v")).as("e"))
        .select(
          try_variant_get(col("e"), "$.op", "string").as("__op"),
          try_variant_get(col("e"), "$.source.table", "string").as("__t"),
          try_variant_get(col("e"), "$.source.lsn", "bigint").as("__l"),
          try_variant_get(col("e"), "$.source.txId", "bigint").as("__x"),
          when(col("__op") === "d",
            try_variant_get(col("e"), "$.before", "string"))
            .otherwise(try_variant_get(col("e"), "$.after", "string")).as("__p"))
        .where(col("__op").isNotNull && col("__t").isNotNull && col("__p").isNotNull)
        .write.format("noop").mode("overwrite").save()
    }

    // C: old pre-round-7 shape — get_json_object everywhere, no framing
    time("C gjo x5 (old)") {
      df.select(
        get_json_object(col("value"), "$.payload.op").as("__op"),
        get_json_object(col("value"), "$.payload.source.table").as("__t"),
        expr("try_cast(get_json_object(value, '$.payload.source.lsn') AS BIGINT)").as("__l"),
        expr("try_cast(get_json_object(value, '$.payload.source.txId') AS BIGINT)").as("__x"),
        when(get_json_object(col("value"), "$.payload.op") === "d",
          get_json_object(col("value"), "$.payload.before"))
          .otherwise(get_json_object(col("value"), "$.payload.after")).as("__p"))
        .where(col("__op").isNotNull && col("__t").isNotNull && col("__p").isNotNull)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
