package graft.core

import graft.SparkSpec
import graft.operators.Transforms
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks for the two subtle operators (SURVEY §5):
  * O14 schema-conform and O11 array-top-1.
  */
class ConformPropertySpec extends SparkSpec {

  /** forAll replacement over fixed seeds (raw ScalaCheck, no scalatest
    * bridge in the offline dep set): deterministic, replayable. */
  private def forSeeds[T](gen: Gen[T], n: Int = 15)(body: T => Unit): Unit =
    (1 to n).foreach { seed =>
      body(gen.pureApply(Gen.Parameters.default, Seed(seed.toLong)))
    }
  import spark.implicits._

  private val target = StructType(Seq(
    StructField("a", StringType), StructField("b", LongType),
    StructField("c", BooleanType)))

  test("property: conform output always has target columns; present data round-trips") {
    val rowGen = for {
      a <- Gen.option(Gen.alphaNumStr.map(_.take(8)))
      b <- Gen.option(Gen.chooseNum(-1000L, 1000L))
    } yield (a.orNull, b.map(_.toString).orNull)
    forSeeds(Gen.listOfN(8, rowGen)) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("a", "b") // c absent; b arrives as string
        val out = SchemaConform.conform(df, target)
        assert(out.columns.toSeq == Seq("a", "b", "c"))
        val got = out.collect()
        assert(got.forall(_.isNullAt(2)))        // absent -> NULL
        val expectB = rows.map(_._2).map(Option(_).map(_.toLong))
        assert(got.map(r => if (r.isNullAt(1)) None else Some(r.getLong(1)))
          .toSeq == expectB)                      // cast round-trip
      }
    }
  }

  test("property: arrayTop1 equals explode+window row_number()=1") {
    val elemGen = for {
      u <- Gen.identifier.map(_.take(6))
      t <- Gen.chooseNum(0, 999999)
    } yield (u, f"2024-01-01T00:$t%06d") // sortable pseudo-timestamps
    val arrGen = Gen.option(Gen.listOf(elemGen).map(_.take(6)))
    forSeeds(Gen.listOfN(12, arrGen)) { arrays =>
      val df = arrays.zipWithIndex
        .map { case (arr, i) => (i.toLong, arr.map(_.map {
          case (u, t) => (u, t) }).orNull) }
        .toDF("id", "usersLoggedOn")
        .withColumn("usersLoggedOn",
          expr("transform(usersLoggedOn, x -> named_struct('userId', x._1, 'lastLogOnDateTime', x._2))"))
      val viaOp = df.select(col("id"),
        Transforms.arrayTop1(col("usersLoggedOn"), "lastLogOnDateTime",
          "userId").getField("p").as("top"))
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      // relational reference implementation
      val w = Window.partitionBy("id")
        .orderBy(col("x.lastLogOnDateTime").desc, col("x.userId").desc)
      val viaWindow = df
        .select(col("id"), explode(col("usersLoggedOn")).as("x"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id"), col("x.userId"))
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      arrays.indices.foreach { i =>
        val id = i.toLong
        val arr = arrays(i)
        if (arr.isEmpty || arr.get.isEmpty)
          assert(viaOp(id).isEmpty)              // null/empty -> NULL
        else assert(viaOp(id) == viaWindow(id))  // tie-break: max userId
      }
    }
  }
}
