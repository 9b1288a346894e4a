package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}

import graft.functions.MinHashSig

/** Session extensions: native functions the built-in operator set
  * can't express efficiently (SURVEY.md §7.4). Enable with
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * - `minhash_sig(text, numHashes, shingleLen)` — compiled MinHash
  *   signature (see [[graft.functions.MinHashSig]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(text, IntegerLiteral(n), IntegerLiteral(len)) =>
          MinHashSig(text, n, len)
        case _ => throw new IllegalArgumentException(
          "usage: minhash_sig(text, numHashes int literal, shingleLen int literal)")
      }))
  }
}
