package graft

import graft.tables.FormatIO
import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class FormatIOSpec extends SparkSpec {

  // the awkward cases text formats get wrong: nulls vs empty strings,
  // embedded delimiters/quotes, unicode, exact decimals, dates
  private lazy val awkward = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("s", StringType),
      StructField("dec", DecimalType(12, 2)),
      StructField("d", DateType),
      StructField("f", DoubleType)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "plain", BigDecimal("1234567890.12").bigDecimal,
          java.sql.Date.valueOf("2021-05-27"), 1.5),
        Row(2L, "comma, \"quote\" end", BigDecimal("-0.01").bigDecimal,
          java.sql.Date.valueOf("1970-01-01"), -3.25),
        Row(3L, null, null, null, null),
        Row(4L, "", BigDecimal("0.00").bigDecimal,
          java.sql.Date.valueOf("2038-01-19"), 0.0),
        Row(5L, "unicode ✓ 中文 émoji", BigDecimal("99.99").bigDecimal,
          java.sql.Date.valueOf("1999-12-31"), 2.5e17)),
      schema)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("readCsvRouted: malformed rows quarantine verbatim, clean rows parse, none lost") {
    val dir = Files.createTempDirectory("graft_fmt_route").toString + "/t"
    FormatIO.writeCsv(awkward.coalesce(1), dir)
    val part = new java.io.File(dir).listFiles().find(_.getName.endsWith(".csv")).get
    java.nio.file.Files.write(part.toPath,
      "zz,bad id,1.00,2020-01-01,0.5\n1,too,2.00,2020-01-01,0.5,many,cols\n".getBytes,
      java.nio.file.StandardOpenOption.APPEND)
    // the local FS keeps a checksum sidecar; the injected bytes invalidate it
    new java.io.File(part.getParent, s".${part.getName}.crc").delete()
    val (good, bad, release) = FormatIO.readCsvRouted(spark, dir, awkward.schema)
    assert(good.count() == awkward.count(), "clean rows must all parse")
    assert(rows(good) == rows(awkward), "routing must not mutate parsed values")
    val quarantined = bad.collect().map(_.getString(0)).toSet
    assert(quarantined.size == 2 && quarantined.exists(_.startsWith("zz,bad id")),
      s"quarantine wrong: $quarantined")
    release() // frees the shared parse cache; idempotent
    release()
  }

  test("CSV round-trip preserves nulls, empty strings, quoting, unicode, decimals, dates") {
    val dir = Files.createTempDirectory("graft_fmt_csv").toString + "/t"
    FormatIO.writeCsv(awkward, dir)
    val back = FormatIO.readCsv(spark, dir, awkward.schema)
    assert(back.schema == awkward.schema)
    assert(rows(back) == rows(awkward))
    // null and empty string survived as DISTINCT values
    assert(back.where("id = 3").head().isNullAt(1))
    assert(back.where("id = 4").head().getString(1) == "")
  }

  test("JSON-lines round-trip preserves nulls and exact types under explicit schema") {
    val dir = Files.createTempDirectory("graft_fmt_json").toString + "/t"
    FormatIO.writeJsonLines(awkward, dir)
    val back = FormatIO.readJsonLines(spark, dir, awkward.schema)
    assert(back.schema == awkward.schema)
    assert(rows(back) == rows(awkward))
    assert(back.where("id = 3").head().isNullAt(1))
  }

  test("CSV round-trips a real table exactly (orders, timestamp column included)") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val dir = Files.createTempDirectory("graft_fmt_orders").toString + "/t"
    FormatIO.writeCsv(src, dir)
    val back = FormatIO.readCsv(spark, dir, src.schema)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("ORC round-trip preserves the awkward cases (nulls, unicode, exact decimals, dates)") {
    val dir = Files.createTempDirectory("graft_fmt_orc").toString + "/t"
    FormatIO.writeOrc(awkward, dir)
    val back = FormatIO.readOrc(spark, dir, awkward.schema)
    assert(back.schema == awkward.schema)
    assert(rows(back) == rows(awkward))
    assert(back.where("id = 3").head().isNullAt(1))
  }

  test("ORC round-trips a real table exactly (lineitem, timestamp column included)") {
    val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val dir = Files.createTempDirectory("graft_fmt_orc_li").toString + "/t"
    FormatIO.writeOrc(src, dir)
    val back = FormatIO.readOrc(spark, dir, src.schema)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }
}
