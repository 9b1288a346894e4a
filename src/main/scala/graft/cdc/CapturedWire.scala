package graft.cdc

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** The reference's CAPTURED wire bytes (data, not code): the verbatim
  * record VALUES of its Debezium topic logs
  * (data/kafka/tmp/kraft-combined-logs/cdc.commerce.{account,product}-0/
  * 00000000000000000000.log, record-batch format v2, decoded), bundled
  * as repo resources. Each line is one record value exactly as the
  * JsonConverter produced it: `{"schema": <connect schema>, "payload":
  * <Debezium envelope>}` with `schemas.enable=true` framing
  * (connect-standalone.properties:25-26).
  *
  * The line-framed file topic carries record VALUES only; record keys
  * (`cdc.commerce.account.Key` framing) are documented in FIXTURES.md
  * §3 — the sink derives primary keys from its own key config, like
  * the reference's sink (`connect-iceberg-sink.json:28-29`).
  */
object CapturedWire {

  /** A Debezium delete tombstone: Kafka carries a NULL record value
    * (for log compaction); the line-framed topic cannot hold a null
    * line, so the JSON literal `null` is the documented stand-in — it
    * parses to nothing and falls out at the sink's op filter.
    */
  val Tombstone = "null"

  /** Verbatim captured record values for a topic (e.g.
    * `cdc.commerce.account`), broker order preserved.
    */
  def lines(topic: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/graft/connect-captured/$topic.jsonl")
    require(in != null, s"CapturedWire: no captured fixture for topic '$topic'")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    finally in.close()
  }

  /** Derive a continuation record from a captured one: identical
    * schema block and envelope shape, mutated op / row images /
    * ordering — how tests extend the captured story (updates, deletes)
    * without fabricating the framing by hand.
    */
  def continuation(captured: String, op: String, before: String,
      after: String, lsn: Long, txId: Long): String = {
    val m = new ObjectMapper
    val root = m.readTree(captured).asInstanceOf[ObjectNode]
    val payload = root.get("payload").asInstanceOf[ObjectNode]
    payload.put("op", op)
    payload.set[ObjectNode]("before", m.readTree(before))
    payload.set[ObjectNode]("after", m.readTree(after))
    val source = payload.get("source").asInstanceOf[ObjectNode]
    source.put("lsn", lsn)
    source.put("txId", txId)
    source.put("snapshot", "false")
    m.writeValueAsString(root)
  }
}
