package graft.functions

import graft.SparkSpec

/** Sessions built with GraftExtensions expose the full graft SQL
  * surface with NO per-session register() calls. newSession() gets a
  * fresh SessionState (no temp functions leaked from other specs), so
  * these resolve through the injected registry alone. */
class GraftFunctionRegistrySpec extends SparkSpec {

  test("injected functions resolve and evaluate in a fresh session") {
    val s = spark.newSession()
    val r = s.sql(
      """SELECT
        |  cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |             array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cs,
        |  graft_simhash64(array(CAST(5 AS BIGINT))) AS sh,
        |  graft_minhash_sig(array(CAST(5 AS BIGINT)), 4) AS mh,
        |  graft_token_count('a b  c') AS tc,
        |  graft_lang_id('the of and to a') AS lang
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) == 5L) // single hash: sign bits = its own bits
    assert(r.getSeq[Long](2).length == 4)
    assert(r.getLong(3) == 3L)
    assert(r.getString(4) == "en")
  }

  test("arity errors are loud, not silent nulls") {
    val s = spark.newSession()
    val e = intercept[Exception](s.sql("SELECT cosine_sim(array(1.0))").collect())
    assert(e.getMessage.contains("cosine_sim") ||
      e.getCause != null && e.getCause.getMessage.contains("cosine_sim"))
  }
}
