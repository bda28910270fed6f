package graft.catalog

import java.nio.file.Files

import graft.SparkSpec
import graft.tables.VersionedTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Guards on the one-shot staged-evolution ThreadLocal that bridges the
  * analyzer's `MERGE ... WITH SCHEMA EVOLUTION` alterTable → loadTable
  * pair (GraftCatalog.stagedEvolution): the slot must never be SERVED
  * outside that rule's own stack frame, and the Spark rule it keys on is
  * pinned by full class name so an upstream rename fails here loudly
  * instead of silently reverting evolving merges to commit-at-analysis
  * semantics. */
class StagedEvolutionSlotSpec extends SparkSpec {

  test("the Spark merge-evolution analyzer rule is pinned by full class name") {
    // GraftCatalog identifies the evolving-merge caller by this exact
    // class being on the stack; if a Spark upgrade renames or relocates
    // it, this spec — not a silent behavior change — is what breaks.
    Class.forName(GraftCatalog.MergeEvolutionRule)
  }

  test("a stale staged slot is drained by the next load, never served") {
    val dir = Files.createTempDirectory("graft_slot").toString + "/t"
    VersionedTable.commitAppend(spark,
      spark.range(0L, 10L).select(col("id").as("k"), (col("id") * 2).as("x"))
        .repartition(2), dir)
    GraftCatalog.register("slot_stale", dir)
    // simulate the analyzer rule dying BETWEEN its alterTable (which
    // staged) and its loadTable (which would pop): the slot holds an
    // uncommitted widened schema when an unrelated load of the SAME dir
    // runs on this thread
    val widened = StructType(
      VersionedTable.schemaOf(spark, dir, None).fields :+
        StructField("phantom", LongType, nullable = true))
    GraftCatalog.stagedEvolution.set(
      (dir, widened, Seq(VersionedTable.AddColumnAlter("phantom", LongType))))
    val cols = spark.table("graft.slot_stale").columns.toSeq
    assert(cols == Seq("k", "x"),
      s"stale slot must not serve the uncommitted widened schema, got $cols")
    // and the slot was drained, not left for a later victim
    assert(Option(GraftCatalog.stagedEvolution.get()).isEmpty)
    // the table itself never gained the column
    assert(VersionedTable.schemaOf(spark, dir, None).fieldNames.toSeq == Seq("k", "x"))
  }
}
