package graft.store

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property: ANY sequence of merges whose batches carry random column
  * subsets (sometimes adding new columns, sometimes widening int→long)
  * ends with (a) the union schema at the widest observed types and
  * (b) every key's latest observed values, with never-seen columns
  * null — the Iceberg-sink evolve-mode contract (S6) across its whole
  * input space rather than the single golden path.
  */
class EvolvePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // batches: key, then optional fields b (string), c (int OR long = widened)
  private case class B(key: Int, b: Option[String], c: Option[Either[Int, Long]])

  private val genBatch: Gen[List[B]] = for {
    n <- Gen.choose(1, 4)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0, 3)
      b <- Gen.option(Gen.alphaStr.map(_.take(4)))
      c <- Gen.option(Gen.oneOf(
        Gen.choose(0, 100).map(Left(_): Either[Int, Long]),
        Gen.choose(5000000000L, 6000000000L).map(Right(_): Either[Int, Long])))
    } yield B(k, b, c))
  } yield rows.groupBy(_.key).map(_._2.last).toList // unique keys per batch

  test("random evolution sequences settle on union schema + latest values") {
    val prop = Prop.forAll(Gen.listOfN(4, genBatch)) { batches =>
      val loc = Files.createTempDirectory("graft-evolve").toString
      val t = UpsertTable(spark, loc)

      batches.foreach { rows =>
        val hasB = rows.exists(_.b.isDefined)
        val hasC = rows.exists(_.c.isDefined)
        val cIsLong = rows.exists(_.c.exists(_.isRight))
        val fields = Seq(StructField("key", IntegerType)) ++
          (if (hasB) Seq(StructField("b", StringType)) else Nil) ++
          (if (hasC) Seq(StructField("c", if (cIsLong) LongType else IntegerType))
           else Nil)
        val data = rows.map { r =>
          val cv: AnyRef = r.c.map {
            case Left(i) =>
              if (cIsLong) java.lang.Long.valueOf(i.toLong): AnyRef
              else java.lang.Integer.valueOf(i): AnyRef
            case Right(l) => java.lang.Long.valueOf(l): AnyRef
          }.orNull
          Row.fromSeq(Seq(r.key) ++
            (if (hasB) Seq(r.b.orNull) else Nil) ++
            (if (hasC) Seq(cv) else Nil))
        }
        t.merge(
          spark.createDataFrame(spark.sparkContext.parallelize(data),
            StructType(fields)),
          autoCreateKeys = Seq("key"))
      }

      // model: latest non-absent value per key per column
      var model = Map.empty[Int, (Option[String], Option[Long])]
      batches.foreach { rows =>
        rows.foreach { r =>
          val hasB = rows.exists(_.b.isDefined)
          val hasC = rows.exists(_.c.isDefined)
          // a merge REPLACES the whole row: absent batch columns become null
          val b = if (hasB) r.b else None
          val c = if (hasC) r.c.map(_.fold(_.toLong, identity)) else None
          model += r.key -> (b, c)
        }
      }

      val schema = t.schema
      val got = t.read().collect().map { row =>
        val b = if (schema.fieldNames.contains("b"))
          Option(row.get(row.fieldIndex("b"))).map(_.toString) else None
        val c = if (schema.fieldNames.contains("c"))
          Option(row.get(row.fieldIndex("c")))
            .map(_.asInstanceOf[Number].longValue()) else None
        row.getInt(row.fieldIndex("key")) -> (b, c)
      }.toMap
      got == model
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(result.passed, result.status.toString)
  }
}
