package graft.pipeline

import graft.SparkSpec
import graft.core.EntitySchemas
import graft.operators.Transforms
import graft.queries.ParityQueries

class PipelineRunnerSpec extends SparkSpec {

  private def cfg(name: String, page: String) = EndpointConfig(
    name = name,
    firstPage = s"${ParityQueries.fixtureRoot}/$page",
    sourceSchema = name match {
      case "managedDevices" => EntitySchemas.managedDeviceSource
      case _ => EntitySchemas.cloudPcSource
    },
    filter = if (name == "managedDevices")
      Some("operatingSystem = 'Windows'") else None,
    transform = if (name == "managedDevices") Transforms.managedDevices _
      else identity[org.apache.spark.sql.DataFrame] _,
    sinkSchema = if (name == "managedDevices") EntitySchemas.managedDeviceSink
      else EntitySchemas.cloudPcSink)

  test("ordered dispatch runs every endpoint and reports metrics") {
    val runner = new PipelineRunner(spark)
    val (ok, failed) = runner.run(Seq(
      cfg("managedDevices", "managedDevices/page1.json"),
      cfg("cloudPCs", "cloudPCs/page1.json")))
    assert(failed.isEmpty)
    assert(ok.keySet == Set("managedDevices", "cloudPCs"))
    assert(ok("managedDevices").count() == 4) // Windows only
    assert(ok("cloudPCs").count() == 3)
    assert(runner.metrics.map(_.entity) == Seq("managedDevices", "cloudPCs"))
    assert(runner.metrics.forall(_.rows > 0))
  }

  test("a failing endpoint is isolated; later endpoints still load (O9)") {
    val runner = new PipelineRunner(spark)
    val broken = cfg("managedDevices", "managedDevices/missing.json")
    val (ok, failed) = runner.run(Seq(broken,
      cfg("cloudPCs", "cloudPCs/page1.json")))
    assert(failed.map(_._1) == Seq("managedDevices"))
    assert(ok.keySet == Set("cloudPCs"))
    assert(ok("cloudPCs").count() == 3)
  }

  test("conformed output always matches the sink schema column set") {
    val runner = new PipelineRunner(spark)
    val (ok, _) = runner.run(Seq(cfg("cloudPCs", "cloudPCs/page1.json")))
    assert(ok("cloudPCs").columns.toSeq ==
      EntitySchemas.cloudPcSink.fieldNames.toSeq)
  }
}
