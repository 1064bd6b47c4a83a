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

  test("authorized export: discovery -> JWT -> token -> kickoff -> poll -> land -> flow") {
    // The reference's whole `bulkexport` control flow (`__init__.py`
    // :616-660) with every network leg scripted: the auth chain mints
    // a Bearer token, the kickoff returns a status URL, the poller
    // sees two 202s before the 200 with the output manifest, the file
    // legs land NDJSON, and runLocalFlow takes over exactly as in the
    // test above. This glues Auth (O4-O7) to O1/O2/S3 end-to-end.
    import graft.pipeline.Auth._
    val base = "https://fhir.example.org/r4"
    val tokUrl = "https://as.example.org/token"
    val statusUrl = s"$base/status/42"
    val fileUrl = s"$base/files/patient-1"
    val ndjson =
      """{"resourceType":"Patient","id":"p9","identifier":[]}"""
    var statusPolls = 0
    val transport = new HttpTransport {
      def get(url: String, headers: Map[String, String]): HttpResponse = url match {
        case u if u == smartConfigUrl(base) =>
          HttpResponse(200, s"""{"token_endpoint":"$tokUrl"}""")
        case u if u == s"$base/Patient/$$export" =>
          assert(headers("Prefer") === "respond-async")
          assert(headers("Authorization").startsWith("Bearer "))
          HttpResponse(202, "", Map("Content-Location" -> statusUrl))
        case u if u == statusUrl =>
          statusPolls += 1
          if (statusPolls < 3) HttpResponse(202, "")
          else HttpResponse(200,
            s"""{"output":[{"type":"Patient","url":"$fileUrl"}]}""")
        case u if u == fileUrl => HttpResponse(200, ndjson)
        case u => HttpResponse(404, s"unscripted $u")
      }
      def postForm(url: String, form: Seq[(String, String)],
                   headers: Map[String, String]): HttpResponse = {
        assert(url === tokUrl)
        assert(form.toMap.apply("grant_type") === "client_credentials")
        HttpResponse(200, """{"access_token":"tok-e2e","expires_in":3600}""")
      }
    }
    val kp = {
      val g = java.security.KeyPairGenerator.getInstance("RSA")
      g.initialize(2048); g.generateKeyPair()
    }
    val tokens = authorize(transport, base, "client-e2e",
      new LocalRsaSigner(kp.getPrivate, "kid-e2e"), scope = "system/*.read")

    val status = kickoffExport(transport, s"$base/Patient/$$export", tokens)
    assert(status === statusUrl)
    val body = BulkPipeline.pollUntilComplete[String](
      probe = () => {
        val r = transport.get(status,
          Map("Authorization" -> s"Bearer ${tokens.current()}"))
        if (r.status == 202) Left(()) else Right(r.body)
      },
      maxTries = 10, sleep = _ => ())
    assert(body.isDefined, "poller never saw the 200")
    assert(statusPolls === 3, s"expected 2x202 + 1x200, polled $statusPolls")

    // land each output file as <Type>-<source>-NNNN.json, then the
    // batch flow runs untouched
    val root = Files.createTempDirectory("authflow").toString
    val stages = BulkPipeline.Stages(root)
    Files.createDirectories(Paths.get(stages.landing))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body.get)
    node.path("output").forEach { out =>
      val tpe = out.path("type").asText
      val payload = transport.get(out.path("url").asText,
        Map("Authorization" -> s"Bearer ${tokens.current()}")).body
      Files.write(Paths.get(stages.landing, s"$tpe-clientA-0001.json"),
        payload.getBytes("UTF-8"))
    }
    val rxDim = Seq(("0", "", "")).toDF("ndc", "name", "rxnorm")
    val (manifest, corrupt) = BulkPipeline.runLocalFlow(
      spark, stages, base,
      Seq("Patient" -> FhirSchemas.patient), rxDim)
    assert(corrupt === Map("Patient" -> 0L))
    assert(manifest.contains(""""type":"Patient""""))
    assert(spark.read.schema(FhirSchemas.patient)
      .json(s"${stages.promoted}/Patient").count() === 1L)
  }
}
