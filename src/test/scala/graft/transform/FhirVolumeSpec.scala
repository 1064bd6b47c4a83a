package graft.transform

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.schemas.FhirSchemas

/** Volume check for the EOB pipeline: 20k generated records through the
  * full filter → positional-write → broadcast-enrich → removal flow,
  * validated by closed-form expected counts. Guards the transform core
  * against accidental driver-side collection — everything must run as
  * one distributed plan.
  */
class FhirVolumeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bcdaEob processes 20k records distributed, with closed-form kept count") {
    val n = 20000
    // i % 4 == 0 → wrong patient; % 4 == 1 → non-pharmacy; % 4 == 2 →
    // stale date; % 4 == 3 → kept (known NDC, display present)
    val lines = spark.range(n).as[Long].map { i =>
      val patient = if (i % 4 == 0) "Patient/other" else FhirTransforms.BcdaDemoPatientRef
      val claim = if (i % 4 == 1) "medical" else "pharmacy"
      val date = if (i % 4 == 2) "2019-01-01" else "2019-12-01"
      s"""{"resourceType":"ExplanationOfBenefit","id":"e$i","meta":{"versionId":"1"},""" +
        s""""patient":{"reference":"$patient"},""" +
        s""""type":{"coding":[{"system":"${FhirTransforms.ClaimTypeSystem}","code":"$claim"}]},""" +
        s""""supportingInfo":[{"valueQuantity":{"value":1.0}},{"valueQuantity":{"value":2.0}}],""" +
        s""""item":[{"servicedDate":"$date","productOrService":{"coding":""" +
        s"""[{"system":"${FhirTransforms.NdcSystem}","code":"11111111111","display":"D"}]},""" +
        s""""quantity":{"value":1.0,"unit":"u"}}]}"""
    }
    val df = spark.read.schema(FhirSchemas.explanationOfBenefit).json(lines)
    val rxDim = Seq(("11111111111", "KnownDrug", "42")).toDF("ndc", "name", "rxnorm")

    val out = FhirTransforms.bcdaEob(df.repartition(8), rxDim)
    assert(out.count() === n / 4)
    // every survivor fully rewritten: appended coding + quantity overwrite
    val check = out.agg(
      count(when(size(element_at(col("item"), 1)
        .getField("productOrService").getField("coding")) === 2, 1)).as("appended"),
      count(when(element_at(col("item"), 1)
        .getField("quantity").getField("unit") === "tabs", 1)).as("tabs"))
      .as[(Long, Long)].head()
    assert(check === ((n / 4, n / 4)))
  }
}
