package graft.util

import org.apache.spark.sql.SparkSession

/** One session builder shared by Verify, Bench, and tests so every
  * entry point runs with identical semantics (UTC, shuffle partitions
  * sized to the local core count, nanos-parquet handling).
  */
object GraftSession {

  def build(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      // Custom Catalyst surface (graft_dot native expression).
      .withExtensions(graft.functions.GraftExtensions.register)
      // One shuffle partition per core: at sf<=0.1 a 200-partition
      // default just multiplies task overhead. On a real cluster this
      // would be ~2-3x total cores (or left to AQE coalescing).
      .config("spark.sql.shuffle.partitions", cpus)
      // Determinism contract with the DuckDB oracle (SURVEY §5).
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet stores TIMESTAMP(NANOS) which Spark's TimestampType
      // (micros) cannot represent; read it as a nanos LONG and convert at
      // the Tables.events boundary.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The driver's parquet stores naive (isAdjustedToUTC=false) micros
      // timestamps; surface them as TimestampType under the UTC session —
      // identical wall-clock values to DuckDB's naive TIMESTAMP read —
      // rather than TIMESTAMP_NTZ, which unix_micros/BIGINT casts reject.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
  }
}
