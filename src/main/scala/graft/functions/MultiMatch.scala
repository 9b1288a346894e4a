package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring counting: `multi_match(text, 'p1,p2,…')`
  * returns `map<string, long>` of per-pattern occurrence counts (ALL
  * positions, overlapping included) in ONE left-to-right pass over the
  * text via an Aho–Corasick automaton.
  *
  * The blocklist-filtering primitive: a curation pipeline screens
  * every document against hundreds of banned/boilerplate phrases, and
  * the per-pattern-regex alternative scans the text once PER PATTERN
  * (or compiles an alternation whose NFA backtracks); Aho–Corasick is
  * O(len + matches) regardless of pattern count — at 100 TB the scan
  * cost does not grow with the blocklist. The automaton is built once
  * per expression from the pattern literal, serialized to executors
  * as plain structures, and shared across rows; the expression itself
  * is codegen-friendly (a static call, like [[TextStats]]).
  *
  * Note for oracle writers: for patterns with no self-overlap (no
  * proper border — true of ordinary words), all-positions counting
  * equals non-overlapping counting, so
  * `(len(t) − len(replace(t, p, ''))) / len(p)` reproduces the count
  * declaratively; MultiMatchSpec covers the self-overlapping cases
  * the SQL form can't express.
  */
case class MultiMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "multi_match: patterns must be non-empty")
  // the output map is keyed by pattern — a duplicate would produce a
  // map with duplicate keys (invalid map semantics, undefined
  // element_at), so reject at construction
  require(patterns.distinct.size == patterns.size,
    s"multi_match: duplicate pattern(s): " +
      patterns.diff(patterns.distinct).distinct.mkString(", "))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"multi_match expects a STRING column, got ${child.dataType}")
  }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "multi_match"

  private lazy val automaton = new AhoCorasick(patterns.toArray)

  override protected def nullSafeEval(input: Any): Any =
    MultiMatch.compute(input.asInstanceOf[UTF8String], automaton)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", automaton, classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MultiMatch$$.MODULE$$.compute($c, $acRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiMatch =
    copy(child = newChild)
}

object MultiMatch {

  def compute(text: UTF8String, ac: AhoCorasick): ArrayBasedMapData = {
    val counts = ac.countAll(text.toString)
    new ArrayBasedMapData(
      new GenericArrayData(ac.patterns.map(UTF8String.fromString(_))),
      new GenericArrayData(counts))
  }
}

/** Classic Aho–Corasick automaton (goto/fail/output links) over the
  * given patterns. Built eagerly from plain serializable structures so
  * an instance ships to executors intact; `countAll` walks the text
  * once and returns per-pattern occurrence counts at every position.
  */
final class AhoCorasick(val patterns: Array[String]) extends Serializable {

  // (per-node char→child maps with node 0 the root, fail links,
  // output pattern-index lists with dictionary-suffix closure)
  private val (gotoMaps, fail, out) = AhoCorasick.build(patterns)

  def countAll(text: String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    var s = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (s != 0 && !gotoMaps(s).contains(ch)) s = fail(s)
      s = gotoMaps(s).getOrElse(ch, 0)
      val hits = out(s)
      var j = 0
      while (j < hits.length) { counts(hits(j)) += 1L; j += 1 }
      i += 1
    }
    counts
  }
}

object AhoCorasick {

  private[functions] def build(patterns: Array[String])
      : (Array[Map[Char, Int]], Array[Int], Array[Array[Int]]) = {
    // trie
    val maps = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val ends = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        s = maps(s).getOrElseUpdate(ch, {
          maps += mutable.Map.empty[Char, Int]
          ends += mutable.ArrayBuffer.empty[Int]
          maps.length - 1
        })
      }
      ends(s) += pi
    }
    val gotoMaps = maps.map(_.toMap).toArray
    // fail links by BFS (parents finalized before children)
    val fail = new Array[Int](gotoMaps.length)
    val order = mutable.ArrayBuffer.empty[Int]
    val queue = mutable.Queue.empty[Int]
    gotoMaps(0).valuesIterator.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      order += u
      gotoMaps(u).foreach { case (ch, v) =>
        var w = fail(u)
        while (w != 0 && !gotoMaps(w).contains(ch)) w = fail(w)
        fail(v) = gotoMaps(w).get(ch) match {
          case Some(x) if x != v => x
          case _ => 0
        }
        queue += v
      }
    }
    // output closure in BFS order: fail(v) is strictly shallower, so
    // out(fail(v)) is complete when v is processed
    val out = new Array[Array[Int]](gotoMaps.length)
    out(0) = ends(0).toArray
    order.foreach { u => out(u) = (ends(u) ++ out(fail(u))).toArray }
    (gotoMaps, fail, out)
  }
}
