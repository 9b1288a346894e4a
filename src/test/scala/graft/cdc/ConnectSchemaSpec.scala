package graft.cdc

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The JsonConverter schema contract: the CAPTURED envelope schema
  * (reference topic log, schemas.enable=true) must map to the exact
  * typed StructType — int32 stays int, MicroTimestamp is recognized as
  * a convertible logical — and unknown connect types must fail loudly.
  */
class ConnectSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("captured account envelope schema parses to the typed row schema") {
    val line = CapturedWire.lines("cdc.commerce.account").head
    // the fixture line is the full framed record; its $.schema is the
    // envelope schema rowSchema consumes
    val schemaJson = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(line).get("schema").toString
    val Some((row, logicals)) = ConnectSchema.rowSchema(schemaJson)
    assert(row === StructType(Seq(
      StructField("user_id", IntegerType, nullable = false),
      StructField("email", StringType, nullable = false),
      StructField("created_at", LongType, nullable = false))))
    assert(logicals === Map("created_at" -> "io.debezium.time.MicroTimestamp"))
  }

  test("non-envelope and malformed schema JSON fall back to None") {
    assert(ConnectSchema.rowSchema("""{"type":"string"}""").isEmpty)
    assert(ConnectSchema.rowSchema("""{"type":"struct","fields":[]}""").isEmpty)
    assert(ConnectSchema.rowSchema("not json at all").isEmpty)
    // after present but scalar-typed: not a row image
    assert(ConnectSchema.rowSchema(
      """{"type":"struct","fields":[{"type":"string","field":"after"}]}""").isEmpty)
  }

  test("unsupported connect type fails loudly instead of guessing") {
    val bad = """{"type":"struct","fields":[{"type":"struct","optional":true,
      "field":"after","fields":[{"type":"uint128","field":"x"}]}]}"""
    intercept[IllegalArgumentException](ConnectSchema.rowSchema(bad))
  }

  test("every convertible Debezium logical type materializes correctly") {
    import spark.implicits._
    val df = Seq((1757389556032031L, 1757389556032L, 1757389556032031999L,
      19708, "2024-01-15T10:30:00Z")).toDF("us", "ms", "ns", "days", "zoned")
    val out = df.select(
      ConnectSchema.materialize("us", "io.debezium.time.MicroTimestamp").get.as("us"),
      ConnectSchema.materialize("ms", "io.debezium.time.Timestamp").get.as("ms"),
      ConnectSchema.materialize("ns", "io.debezium.time.NanoTimestamp").get.as("ns"),
      ConnectSchema.materialize("days", "io.debezium.time.Date").get.as("days"),
      ConnectSchema.materialize("zoned", "io.debezium.time.ZonedTimestamp").get.as("zoned"))
    assert(out.schema.fields.map(_.dataType).toSeq === Seq(
      TimestampType, TimestampType, TimestampType, DateType, TimestampType))
    val r = out.select(unix_micros(col("us")), unix_micros(col("ms")),
      unix_micros(col("ns")), date_format(col("days"), "yyyy-MM-dd"),
      unix_micros(col("zoned"))).head()
    assert(r.getLong(0) === 1757389556032031L)
    assert(r.getLong(1) === 1757389556032000L)
    assert(r.getLong(2) === 1757389556032031L) // nanos floor to micros
    assert(r.getString(3) === "2023-12-17")    // epoch day 19708
    assert(r.getLong(4) === 1705314600000000L) // 2024-01-15T10:30Z
  }

  test("annotation-only logical names ride through unconverted") {
    assert(ConnectSchema.materialize("snapshot", "io.debezium.data.Enum").isEmpty)
  }

  test("nested struct / array / map connect types map recursively") {
    val json = """{"type":"struct","fields":[
      {"type":"struct","optional":true,"field":"after","fields":[
        {"type":"struct","field":"addr","fields":[
          {"type":"string","field":"city"}]},
        {"type":"array","items":{"type":"int64"},"field":"scores"},
        {"type":"map","keys":{"type":"string"},"values":{"type":"float64"},
          "field":"attrs"},
        {"type":"int8","field":"b"},{"type":"int16","field":"s"},
        {"type":"float32","field":"f"},{"type":"boolean","field":"ok"},
        {"type":"bytes","field":"blob"}]}]}"""
    val Some((row, logicals)) = ConnectSchema.rowSchema(json)
    assert(row("addr").dataType ===
      StructType(Seq(StructField("city", StringType))))
    assert(row("scores").dataType === ArrayType(LongType))
    assert(row("attrs").dataType === MapType(StringType, DoubleType))
    assert(Seq("b", "s", "f", "ok", "blob").map(row(_).dataType) ===
      Seq(ByteType, ShortType, FloatType, BooleanType, BinaryType))
    assert(logicals.isEmpty)
  }
}
