package graft.ingest

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Columnar/delimited source-format coverage beyond Parquet + NDJSON:
  * ORC (Spark's second built-in columnar format — a lake this engine
  * lands in may already hold ORC) and schema'd CSV with PERMISSIVE
  * corrupt-record quarantine (the delimited twin of the NDJSON
  * quarantine path). Both are exercised as round-trips against the
  * driver's own events table so content equality is checked against
  * the Parquet source of truth, not against a fixture.
  */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("ORC round-trip preserves the events table exactly") {
    val src = graft.util.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value"))
    val out = Files.createTempDirectory("orc_rt").toString + "/events_orc"
    src.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.schema === src.schema, "ORC must preserve the exact schema")
    val a = src.orderBy(col("event_id")).collect()
    val b = back.orderBy(col("event_id")).collect()
    assert(a === b, "ORC round-trip must be content-exact")
  }

  test("ORC scan pushes filters and prunes columns like parquet") {
    val src = graft.util.Tables.events(spark, dir)
    val out = Files.createTempDirectory("orc_push").toString + "/events_orc"
    src.write.mode("overwrite").orc(out)
    val plan = spark.read.orc(out)
      .filter(col("user_id") === 7L)
      .select(col("event_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]"),
      s"filter must reach the ORC scan\n$plan")
    assert(plan.contains("ReadSchema: struct<event_id:bigint,user_id:bigint>"),
      s"scan must read only the needed columns\n$plan")
  }

  test("schema'd CSV read parses good rows and quarantines malformed ones") {
    val dir = Files.createTempDirectory("csv_q").toString
    Files.write(java.nio.file.Paths.get(dir, "batch.csv"), Seq(
      "event_id,user_id,value",
      "1,10,2.5",
      "2,11,0.75",
      "not-a-number,12,1.0", // malformed: event_id fails the LONG schema
      "3,13"                 // malformed: missing column
    ).mkString("\n").getBytes)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("value", DoubleType),
      StructField("_corrupt", StringType)))
    val df = spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(dir)
      .cache() // corrupt-record column requires referencing the full row set
    val good = df.filter(col("_corrupt").isNull)
    val bad = df.filter(col("_corrupt").isNotNull)
    assert(good.count() === 2, "two clean rows parse")
    assert(bad.count() === 2, "both malformed rows quarantine, none dropped")
    assert(good.select(sum(col("event_id"))).as[Long].head() === 3L)
    // the quarantine keeps the ORIGINAL line for replay, like Ndjson
    assert(bad.select(col("_corrupt")).as[String].collect()
      .exists(_.startsWith("not-a-number")))
    df.unpersist()
  }

  test("CSV round-trip through an explicit schema is content-exact") {
    val src = graft.util.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val out = Files.createTempDirectory("csv_rt").toString + "/events_csv"
    src.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.schema(src.schema).option("header", "true").csv(out)
    val a = src.orderBy(col("event_id")).collect()
    val b = back.orderBy(col("event_id")).collect()
    assert(a === b, "schema'd CSV round-trip must be content-exact")
  }
}
