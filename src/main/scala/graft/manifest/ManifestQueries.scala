package graft.manifest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Q, QueryModule}
import graft.util.Tables._

/** Manifest/metadata operators (SURVEY.md §2.3) plus the NDJSON/JSON
  * codec surface (S1/S2, `q_json_extract`): the reference's
  * filename-derived typing, import-manifest build/scan, `_since`
  * incremental cursor, regex rename, and line-JSON parse path.
  */
object ManifestQueries extends QueryModule {

  /** M1 — type-from-filename projection (ref `__init__.py:218`:
    * `blob_name.split('-')[0]`). `split(...)(0)` is a codegen'd
    * expression; at scale this is how partition identity is recovered
    * from `input_file_name()` without touching row data.
    */
  val splitExtract = Q(
    "q_split_extract",
    (s, dir) =>
      t(s, dir, "part")
        .withColumn("type_head", split(col("p_type"), " ")(0))
        .groupBy(col("type_head"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("type_head")),
    Some("""
      SELECT split_part(p_type, ' ', 1) AS type_head, count(*) AS n
      FROM part GROUP BY 1 ORDER BY 1""")
  )

  /** M2 — manifest build: group file entries into a per-type input list
    * (ref `build_fhir_import_parameters`, `__init__.py:205-242`).
    * `sort_array(collect_list(...))` gives deterministic list order —
    * the groupBy shuffles only (type → names), tiny metadata at any SF.
    */
  val manifestAgg = Q(
    "q_manifest_agg",
    (s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_files"),
          array_join(
            sort_array(collect_list(concat(lit("doc-"), col("doc_id")))),
            ",").as("files"))
        .orderBy(col("source")),
    Some("""
      SELECT source, count(*) AS n_files,
             string_agg('doc-' || doc_id, ',' ORDER BY 'doc-' || doc_id) AS files
      FROM documents GROUP BY source ORDER BY source""")
  )

  /** M3 — manifest scan/explode: iterate `output[]` entries into
    * (type, url) rows (ref `__init__.py:644-648`). Generic
    * array→rows via `explode`; the array is built from `p_type` words
    * so the oracle sees the same parquet input.
    */
  val manifestExplode = Q(
    "q_manifest_explode",
    (s, dir) =>
      t(s, dir, "part")
        .select(explode(split(col("p_type"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("word")),
    Some("""
      SELECT word, count(*) AS n
      FROM (SELECT unnest(string_split(p_type, ' ')) AS word FROM part)
      GROUP BY 1 ORDER BY 1""")
  )

  /** M4 — incremental `_since` cursor (ref `__init__.py:609-613`:
    * `$export?_since={ts}` fetches only resources modified after the
    * watermark). As a batch predicate this is the pattern that rides
    * parquet min/max stats + partition pruning at 100 TB; the true
    * streaming form is `withWatermark` (graft.streaming).
    */
  val incrementalSince = Q(
    "q_incremental_since",
    (s, dir) =>
      events(s, dir)
        .filter(col("ts") >= ts("2024-01-05 00:00:00"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("value"), 2).as("sum_value"),
          unix_millis(max(col("ts"))).as("max_ts_ms"))
        .orderBy(col("event_type")),
    Some("""
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             epoch_ms(max(ts)) AS max_ts_ms
      FROM events WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      GROUP BY event_type ORDER BY event_type""")
  )

  /** S7 — rename-by-regex (ref `__init__.py:698-716`:
    * `re.sub('\d+', str(ts), blob_name)` before re-import). Pure name
    * derivation: `regexp_replace` replaces ALL digit runs (DuckDB needs
    * the 'g' flag to match Python/Spark semantics).
    */
  val renameManifest = Q(
    "q_rename_manifest",
    (s, dir) =>
      t(s, dir, "documents")
        .select(concat_ws("-", col("source"), col("doc_id"), col("lang")).as("name"))
        .withColumn("renamed", regexp_replace(col("name"), "[0-9]+", "1700000000"))
        .orderBy(col("name")),
    Some("""
      SELECT source || '-' || doc_id || '-' || lang AS name,
             regexp_replace(source || '-' || doc_id || '-' || lang,
                            '[0-9]+', '1700000000', 'g') AS renamed
      FROM documents ORDER BY name""")
  )

  /** S1/S2 — NDJSON codec round-trip (ref `__init__.py:359,535`:
    * split-on-newline + `json.loads` per line; `json.dumps` + join on
    * write). Each row is serialized to a JSON line with `to_json` and
    * parsed back with an explicit schema via `from_json` — the same
    * schema'd, malformed-tolerant path `spark.read.json` uses, minus
    * file I/O so the oracle can verify it relationally. File-level
    * NDJSON I/O is covered by graft.ingest.Ndjson unit tests.
    */
  val ndjsonIngest = Q(
    "q_ndjson_ingest",
    (s, dir) => {
      val lineSchema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType)))
      events(s, dir)
        .select(to_json(struct(
          col("event_id"), col("user_id"), col("event_type"), col("value"))).as("line"))
        .select(from_json(col("line"), lineSchema).as("r"))
        .select(col("r.event_id"), col("r.user_id"), col("r.event_type"), col("r.value"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY event_type ORDER BY event_type""")
  )

  /** JSON extraction over an embedded JSON string column (SURVEY §2.5
    * "json fns"; ref parses nested JSON per record at
    * `__init__.py:542`). `get_json_object` evaluates without a full
    * schema — the right tool when only one path is needed from a wide
    * payload (no shredding cost).
    */
  val jsonExtract = Q(
    "q_json_extract",
    (s, dir) =>
      events(s, dir)
        .select(get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("k")),
    Some("""
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n
      FROM events GROUP BY 1 ORDER BY 1""")
  )

  /** Schema-drift union — the multi-source ingest reality every
    * long-lived pipeline hits: a legacy feed without `props`, a v2
    * feed that dropped `value` and added a `channel` column, landed
    * into ONE table via `unionByName(allowMissingColumns = true)`
    * (absent columns null-fill; matching is BY NAME, the thing
    * positional UNION silently corrupts when schemas drift). Output
    * is the per-source null census — the drift report a data contract
    * monitor alerts on. Scale shape: both branches are scan-side
    * filters of the same source with map-side projections; the union
    * is plan-level (no shuffle) and the census is one aggregate.
    */
  val unionDrift = Q(
    "q_union_drift",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val legacy = ev.filter(col("event_id") % 2 === 0)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), lit("legacy").as("src"))
      val v2 = ev.filter(col("event_id") % 2 === 1)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("props"), upper(col("event_type")).as("channel"),
          lit("v2").as("src"))
      legacy.unionByName(v2, allowMissingColumns = true)
        .groupBy(col("src"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("null_value"),
          sum(when(col("props").isNull, 1L).otherwise(0L)).as("null_props"),
          sum(when(col("channel").isNull, 1L).otherwise(0L)).as("null_channel"))
        .orderBy(col("src"))
    },
    Some("""
      WITH u AS (
        SELECT event_id, user_id, event_type, value,
               NULL AS props, NULL AS channel, 'legacy' AS src
        FROM events WHERE event_id % 2 = 0
        UNION ALL
        SELECT event_id, user_id, event_type, NULL,
               props, upper(event_type), 'v2'
        FROM events WHERE event_id % 2 = 1)
      SELECT src, count(*) AS n,
             CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_value,
             CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_props,
             CAST(sum(CASE WHEN channel IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_channel
      FROM u GROUP BY src ORDER BY src""")
  )

  override def all: Seq[Q] = Seq(
    splitExtract, manifestAgg, manifestExplode, incrementalSince,
    renameManifest, ndjsonIngest, jsonExtract, unionDrift)
}
