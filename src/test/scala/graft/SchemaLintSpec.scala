package graft

import org.apache.spark.sql.types._

/**
 * Fleet-wide schema lint, mechanizing the round-2 decimal rule: the driver's
 * correctness hash normalizes DECIMAL asymmetrically between Spark parquet
 * and DuckDB, so no declared query may emit DecimalType in its final schema
 * (cast to DOUBLE in the final projection instead). q_matview_refresh
 * violated this in round 8 and stayed red for two rounds; this spec fails at
 * authoring time if the rule is ever re-violated.
 *
 * Builds every `SparkEntry.queries` plan at sf0.001 (schema only — no
 * action is triggered beyond the side effects a query's own setup performs)
 * and walks the result schema recursively through structs/arrays/maps.
 */
class SchemaLintSpec extends SparkSpec {

  private def decimalPaths(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType      => Seq(path)
    case s: StructType       => s.fields.flatMap(f => decimalPaths(f.dataType, s"$path.${f.name}")).toSeq
    case a: ArrayType        => decimalPaths(a.elementType, s"$path[]")
    case m: MapType          => decimalPaths(m.keyType, s"$path.key") ++ decimalPaths(m.valueType, s"$path.value")
    case _                   => Seq.empty
  }

  test("no declared query emits DecimalType in its final schema") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val hits = df.schema.fields.flatMap(f => decimalPaths(f.dataType, s"$name:${f.name}"))
      offenders ++= hits
    }
    assert(offenders.isEmpty,
      s"DecimalType in final projection (cast to DOUBLE per the round-2 rule): ${offenders.mkString(", ")}")
  }
}
