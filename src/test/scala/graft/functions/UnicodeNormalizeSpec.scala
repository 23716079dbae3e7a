package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("combining sequences normalize to precomposed; NFC text unchanged") {
    val df = Seq(
        ("é", "é"),              // e + combining acute -> é
        ("Å", "Å"),              // A + ring -> Å
        ("é", "é"),               // already NFC
        ("plain ascii", "plain ascii"))
      .toDF("raw", "expected")
    val out = df.select(
      UnicodeFunctions.nfcNormalize($"raw").as("norm"), $"expected")
    assert(out.filter($"norm" =!= $"expected").count() == 0)
    // the visually-identical pair really was distinct pre-normalization
    assert("é" != "é")
  }

  test("dedup sees normalized equals: hash collapses the two encodings") {
    val df = Seq((1L, "café"), (2L, "café")).toDF("id", "text")
    val distinctRaw = df.select(countDistinct($"text")).head.getLong(0)
    val distinctNorm = df.select(countDistinct(
      UnicodeFunctions.nfcNormalize($"text"))).head.getLong(0)
    assert(distinctRaw == 2 && distinctNorm == 1)
  }

  test("null propagates; SQL surface resolves in a fresh session") {
    val s = spark.newSession()
    import s.implicits._
    val r = s.sql("SELECT graft_nfc_normalize(NULL), " +
      "graft_nfc_normalize('é')").collect().head
    assert(r.isNullAt(0) && r.getString(1) == "é")
  }
}
