package graft.operators

import graft.SparkSpec
import graft.core.EntitySchemas
import graft.sources.ODataPageReader
import graft.queries.ParityQueries
import org.apache.spark.sql.functions._

class TransformsSpec extends SparkSpec {

  private lazy val md = ODataPageReader.readPages(spark,
    s"${ParityQueries.fixtureRoot}/managedDevices/page1.json",
    EntitySchemas.managedDeviceSource)

  test("pagination follows nextLink across pages (4 + 2 rows)") {
    assert(md.count() == 6)
  }

  test("array top-1 picks most recent logon, NULL for empty/null array") {
    val out = Transforms.managedDevices(md)
      .select("id", "userLoggedOnUserId", "userLoggedOnLastLogOnDateTime")
      .collect().map(r => r.getString(0).take(1) -> Option(r.getString(1))).toMap
    // device 1: three logons out of order -> ...0002 (2024-11-01) wins
    assert(out("1").contains("aaaa1111-0000-0000-0000-000000000002"))
    assert(out("2").isEmpty)  // empty array
    assert(out("4").isEmpty)  // absent array
  }

  test("health-state flatten: parent overwritten by .state, NULL propagates") {
    val out = Transforms.managedDevices(md)
      .select("id", "configurationManagerClientHealthState",
        "configurationManagerClientErrorCode")
      .collect()
      .map(r => r.getString(0).take(1) ->
        ((Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
    assert(out("1") == ((Some("healthy"), Some(0L))))
    assert(out("5") == ((Some("unhealthy"), Some(-2147467259L))))
    assert(out("2") == ((None, None))) // null struct
  }

  test("audit flatten: null actor and empty resources yield NULLs") {
    val aud = ODataPageReader.readPages(spark,
      s"${ParityQueries.fixtureRoot}/auditEvents/page1.json",
      EntitySchemas.auditEventSource)
    val out = Transforms.auditEvents(aud)
      .select("id", "actorUserPrincipalName", "resourcesDisplayName")
      .collect()
      .map(r => r.getString(0) -> ((Option(r.getString(1)), Option(r.getString(2)))))
      .toMap
    assert(out("ffff0002-0000-0000-0000-000000000002") ==
      ((Some("bravo@contoso.com"), Some("CPC-bravo-Q2XWN,eeee0002-0000-0000-0000-000000000002"))))
    assert(out("ffff0003-0000-0000-0000-000000000003") == ((None, None)))
  }
}
