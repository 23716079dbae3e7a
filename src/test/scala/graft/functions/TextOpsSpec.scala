package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii scrubs planted emails, IPv4s, and phone runs; clean text untouched") {
    val rows = Seq(
      ("contact bob.smith+x@example.co.uk now", "contact <email> now"),
      ("server at 192.168.0.1 port", "server at <ip> port"),
      ("call +1 (555) 123-4567 today", "call <phone> today"),
      ("mixed a@b.io 10.0.0.255 and 555 867 5309 end",
        "mixed <email> <ip> and <phone> end"),
      ("no pii here at all", "no pii here at all"))
    val out = rows.map(_._1).toDF("text")
      .select(TextOps.redactPii($"text")).as[String].collect()
    out.zip(rows.map(_._2)).foreach { case (got, want) =>
      assert(got == want)
    }
  }

  test("SQL registration: graft_* functions equal the Column API on real docs") {
    TextOps.register(spark)
    graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(50).createOrReplaceTempView("docs_sqlreg")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_lang_id(text) AS l, graft_quality_score(text) AS q,
        |  graft_fingerprint(text) AS f, graft_redact_pii(text) AS r,
        |  graft_repetition_ratio(text) AS rr
        |FROM docs_sqlreg ORDER BY doc_id""".stripMargin).collect()
    val viaCol = spark.table("docs_sqlreg")
      .select($"doc_id", TextOps.langId($"text"), TextOps.qualityScore($"text"),
        TextOps.fingerprint($"text"), TextOps.redactPii($"text"),
        TextOps.repetitionRatio($"text"))
      .orderBy("doc_id").collect()
    assert(viaSql.toSeq == viaCol.toSeq)
    // arity misuse fails with a clear message
    val e = intercept[Exception](spark.sql("SELECT graft_lang_id('a','b')"))
    assert(e.getMessage.contains("exactly 1 argument"))
  }

  test("topNgram: run-length argmax matches brute force; smallest gram wins ties") {
    // planted: "b b" occurs 2x, "a b" 2x -> tie broken to "a b" (lex smallest)
    val rows = Seq(
      ("a b a b b b", 2L, "a b"),     // grams: ab ba ab bb bb -> ab:2 bb:2 tie
      ("x y x y x y x", 3L, "x y"),   // xy:3 yx:3 tie -> "x y" < "y x"
      ("q q q q", 3L, "q q"),         // qq qq qq
      ("u v w", 1L, "u v"),           // all distinct, first lex
      ("solo", 0L, ""),               // < 2 tokens
      ("", 0L, ""))
    val out = rows.map(_._1).toDF("text")
      .select(TextOps.topNgram($"text", 2).as("t"))
      .select($"t.cnt", $"t.gram").as[(Long, String)].collect()
    out.zip(rows).foreach { case ((cnt, gram), (txt, wantCnt, wantGram)) =>
      assert(cnt == wantCnt && gram == wantGram, s"for '$txt'")
    }
    // brute-force agreement on real corpus text: per-doc explode + count
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val fast = docs.select($"doc_id", TextOps.topNgram($"text", 2).as("t"))
      .select($"doc_id", $"t.cnt".as("cnt"), $"t.gram".as("gram"))
    val brute = docs
      .select($"doc_id", explode(TextOps.ngramOccurrences($"text", 2)).as("gram"))
      .groupBy("doc_id", "gram").count()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(desc("count"), asc("gram"))))
      .filter($"rn" === 1)
      .select($"doc_id", $"count".as("cnt"), $"gram")
    assert(fast.orderBy("doc_id").collect().toSeq ==
      brute.orderBy("doc_id").collect().toSeq)
  }

  test("repetitionRatio: 0 for unique text, rises with repeats, 0 below n tokens") {
    val vals = Seq(
      "a b c d e",        // 4 bigrams, all distinct -> 0.0
      "a b a b a b",      // 5 bigrams, 2 distinct -> 0.6
      "x x x x x",        // 4 bigrams, 1 distinct -> 0.75
      "solo",             // < 2 tokens -> 0.0
      "")                 // empty -> 0.0
      .toDF("text")
      .select(TextOps.repetitionRatio($"text")).as[Double].collect()
    assert(vals(0) == 0.0)
    assert(math.abs(vals(1) - 0.6) < 1e-12)
    assert(vals(2) == 0.75)
    assert(vals(3) == 0.0 && vals(4) == 0.0)
  }
}
