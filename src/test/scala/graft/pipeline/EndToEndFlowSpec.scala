package graft.pipeline

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.schemas.FhirSchemas
import graft.transform.FhirTransforms

/** End-to-end replica of the reference's `bulkimport` request (SURVEY
  * §3.1): landing NDJSON → quarantine → transform → promote → manifest,
  * in one `runLocalFlow` call.
  */
class EndToEndFlowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("epic bulkimport flow: transform, quarantine, promote, manifest") {
    val root = Files.createTempDirectory("flow").toString
    val stages = BulkPipeline.Stages(root)

    Files.createDirectories(Paths.get(stages.landing))
    Files.write(Paths.get(stages.landing, "Patient-clientA-0001.json"), Seq(
      s"""{"resourceType":"Patient","id":"${FhirTransforms.EpicDemoPatientId}","identifier":[{"system":"old","value":"v"}]}""",
      """{"resourceType":"Patient","id":"p2","identifier":[]}""",
      """{"resourceType":"Patient", MALFORMED""").mkString("\n").getBytes)
    Files.write(Paths.get(stages.landing, "Condition-clientA-0001.json"), Seq(
      """{"resourceType":"Condition","id":"c1","recordedDate":"1999-01-01"}""",
      """{"resourceType":"Condition","id":"c2","recordedDate":"1999-01-02"}""").mkString("\n").getBytes)

    val rxDim = Seq(("0", "", "")).toDF("ndc", "name", "rxnorm")
    val (manifest, corrupt) = BulkPipeline.runLocalFlow(
      spark, stages, "https://epic.example/fhir",
      Seq("Patient" -> FhirSchemas.patient, "Condition" -> FhirSchemas.condition),
      rxDim)

    // quarantine counted, not fatal
    assert(corrupt === Map("Patient" -> 1L, "Condition" -> 0L))

    // transforms applied in the promoted output
    val patients = spark.read.schema(FhirSchemas.patient)
      .json(s"${stages.promoted}/Patient")
    val demoMbi = patients
      .filter(col("id") === FhirTransforms.EpicDemoPatientId)
      .select(element_at(col("identifier"), 1).getField("value")).as[String].head()
    assert(demoMbi === "1S00E00AA27")
    val conditions = spark.read.schema(FhirSchemas.condition)
      .json(s"${stages.promoted}/Condition")
    assert(conditions.select("recordedDate").distinct().as[String].collect() ===
      Array("2019-09-04T11:10:27.000Z"))

    // processed dir was renamed away; manifest lists both types
    assert(!new java.io.File(s"${stages.processed}/Patient").exists())
    assert(manifest.contains(""""inputFormat":"application/fhir+ndjson""""))
    assert(manifest.contains(""""type":"Patient""""))
    assert(manifest.contains(""""type":"Condition""""))
  }
}
