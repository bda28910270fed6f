package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Text-format interchange (CSV / JSON-lines) with exact round-trip
  * discipline — the reference's Delta/parquet surface extended to the
  * interchange formats a data-engineering pipeline actually meets at its
  * edges (vendor drops, exports to downstream consumers).
  *
  * Two rules make these scale-safe and lossless:
  *
  *  - **Schema is always explicit on read.** `inferSchema` is a FULL extra
  *    pass over the data before the real job starts — at 100 TB the
  *    inference scan costs as much as the query. It is also lossy
  *    (DECIMAL(12,2) infers as DOUBLE, DATE can infer as TIMESTAMP or
  *    STRING). Callers pass the `StructType`; types parse exactly
  *    (decimal/date/timestamp included).
  *  - **Null encoding is explicit.** CSV cannot natively distinguish null
  *    from empty string; a sentinel (`\N`, the classic mysqldump/Hive
  *    convention) is set symmetrically on write and read so both survive.
  *    JSON-lines needs no sentinel (`null` is first-class) but drops
  *    null-valued fields by default on write — harmless under an explicit
  *    read schema, which restores them as nulls.
  *
  * Both formats stay line-splittable (one record per line, embedded
  * newlines escaped by the writer for JSON, quoted for CSV with
  * `multiLine=false` contract) so a 100 TB directory still splits into
  * parallel read tasks. CSV with embedded record-separator newlines
  * requires `multiLine=true`, which makes each FILE the split unit — flag
  * exposed, default off, documented as the scale hazard it is.
  */
object FormatIO {

  private val NullSentinel = "\\N"

  private def csvOptions(extra: Map[String, String]): Map[String, String] = Map(
    "header"            -> "true",
    // the one option that MUST be symmetric: null ↔ \N. Empty strings use
    // the engine defaults, which are asymmetric on purpose (write renders
    // `""`, read parses a quoted empty back to the empty string) — setting
    // emptyValue identically on both sides would turn read-back empties
    // into the literal two-character string `""`.
    "nullValue"         -> NullSentinel,
    "escape"            -> "\"", // RFC-4180 doubled-quote escaping
    "dateFormat"        -> "yyyy-MM-dd",
    "timestampFormat"   -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
  ) ++ extra

  /** Write `df` as headered CSV under `dir` (one file per partition —
    * splittable, parallel; callers wanting one file coalesce first). */
  def writeCsv(df: DataFrame, dir: String, options: Map[String, String] = Map.empty): Unit =
    df.write.mode("overwrite").options(csvOptions(options)).csv(dir)

  /** Read CSV written by [[writeCsv]] (or any CSV matching the documented
    * conventions) under an EXPLICIT schema. `multiLine=true` only if
    * records embed raw newlines — it disables intra-file split parallelism. */
  def readCsv(spark: SparkSession, dir: String, schema: StructType,
      multiLine: Boolean = false): DataFrame =
    spark.read.options(csvOptions(Map("multiLine" -> multiLine.toString)))
      .schema(schema).csv(dir)

  /** Error-tolerant CSV ingest with bad-record routing — the batch
    * counterpart of `StreamingInference.streamValidateRoute`: rows that
    * parse under the explicit schema flow to the first frame, rows that
    * don't (wrong arity, unparsable types, broken quoting) arrive VERBATIM
    * in the second as (`raw_record`) — quarantined for inspection and
    * replay, never silently nulled or dropped. One vendor's malformed
    * line must cost one quarantine row, not a 100 TB job.
    *
    * Implementation notes: PERMISSIVE mode + `columnNameOfCorruptRecord`;
    * the parsed frame is cached before the corrupt-column filters because
    * Spark forbids filtering the internal corrupt column on a raw file
    * scan (the column only materializes when the row is actually
    * malformed). The third element releases that shared cache — call it
    * once both frames have been consumed. */
  def readCsvRouted(spark: SparkSession, dir: String, schema: StructType,
      multiLine: Boolean = false): (DataFrame, DataFrame, () => Unit) = {
    import org.apache.spark.sql.functions.col
    val corrupt = "_graft_corrupt"
    val parsed = spark.read
      .options(csvOptions(Map(
        "multiLine" -> multiLine.toString,
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> corrupt)))
      .schema(schema.add(corrupt, org.apache.spark.sql.types.StringType))
      .csv(dir)
      .cache()
    val good = parsed.where(col(corrupt).isNull).drop(corrupt)
    val bad  = parsed.where(col(corrupt).isNotNull)
      .select(col(corrupt).as("raw_record"))
    (good, bad, () => { parsed.unpersist(); () })
  }

  /** Write `df` as JSON-lines under `dir`. Decimals serialize as plain JSON
    * numbers (exact digits, no float hop); dates/timestamps as ISO strings. */
  def writeJsonLines(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").json(dir)

  /** Read JSON-lines under an EXPLICIT schema — same no-inference rule as
    * [[readCsv]] (JSON inference additionally widens every integral to
    * BIGINT and decimal to DOUBLE, silently). Fields absent on a line
    * (e.g. written-null) come back null. */
  def readJsonLines(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(dir)

  /** [[readCsvRouted]] for JSON-lines: rows that parse under the explicit
    * schema flow to the first frame; lines that don't (broken JSON, type
    * conflicts) quarantine verbatim in the second. Same PERMISSIVE +
    * corrupt-column mechanics and cache-release thunk. Note the
    * JSON-specific trap this routes around: under plain PERMISSIVE reads
    * a malformed line silently becomes an all-null row — here it is
    * preserved for inspection instead. */
  def readJsonLinesRouted(spark: SparkSession, dir: String,
      schema: StructType): (DataFrame, DataFrame, () => Unit) = {
    import org.apache.spark.sql.functions.col
    val corrupt = "_graft_corrupt"
    val parsed = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .schema(schema.add(corrupt, org.apache.spark.sql.types.StringType))
      .json(dir)
      .cache()
    val good = parsed.where(col(corrupt).isNull).drop(corrupt)
    val bad  = parsed.where(col(corrupt).isNotNull)
      .select(col(corrupt).as("raw_record"))
    (good, bad, () => { parsed.unpersist(); () })
  }

  /** Write `df` as ORC under `dir`. ORC is the other columnar interchange
    * format a lake-adjacent pipeline meets (Hive-era warehouses); unlike the
    * text formats it carries its own typed schema, per-stripe min/max
    * statistics (predicate pushdown works on read — same
    * `PushedFilters` contract as parquet) and splittable stripes, so the
    * 100 TB read path parallelizes and prunes exactly like our parquet
    * tables. Types round-trip natively — no sentinel conventions needed. */
  def writeOrc(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").orc(dir)

  /** Read ORC under an EXPLICIT schema — the no-inference rule costs
    * nothing here (ORC footers carry the schema) but keeps the contract
    * uniform: the caller states what the table IS, and drift between the
    * files and the declared schema surfaces as an error at the scan, not as
    * silently widened types downstream. */
  def readOrc(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(dir)
}
