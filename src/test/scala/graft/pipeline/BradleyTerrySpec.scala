package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q224 fixed-point invariants on the real fixture: win/match
  * bookkeeping is conserved and the normalized ratings behave like a
  * probability-share vector (the properties a leaderboard consumer
  * relies on, independent of the oracle's arithmetic replay).
  */
class BradleyTerrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q224: wins/matches conserve, ratings normalized and positive") {
    val rows = CurationQueries.queries("q224_bradley_terry")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val wins = rows.map(_.getLong(1))
    val matches = rows.map(_.getLong(2))
    val ratings = rows.map(_.getLong(3))
    // every match has exactly one winner and appears in two players'
    // match counts
    assert(wins.sum * 2 === matches.sum)
    assert(ratings.forall(_ >= 1L))
    // micro shares: sum within integer-truncation slack of 1e6
    assert(ratings.sum <= 1000000L)
    assert(ratings.sum >= 1000000L - rows.length)
    // a player that won nothing must sit at the floor of the table
    val zeroWin = rows.filter(_.getLong(1) == 0L).map(_.getLong(3))
    if (zeroWin.nonEmpty) assert(zeroWin.max <= ratings.max)
  }
}
