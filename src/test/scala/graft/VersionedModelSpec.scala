package graft

import graft.tables.VersionedTable
import org.apache.spark.sql.functions._
import scala.util.Random

/** Model-based randomized testing of the whole versioned-table DML surface:
  * a deterministic-seed random sequence of operations (append, CoW
  * update/delete, MoR DV delete/update, merge, compact, DV compaction,
  * restore) runs against BOTH the real table and an in-memory model of
  * (key -> value) state per version. After the run, EVERY version's read
  * must equal its model snapshot — one assertion that exercises delta-log
  * resolution, checkpoint cadence, deletion-vector masking, stacked masks,
  * mask materialization, rebase-free single-writer OCC paths, and
  * time-travel reads all at once. Three seeds, ~18 ops each.
  */
class VersionedModelSpec extends SparkSpec {
  import spark.implicits._

  private def dirOf() =
    java.nio.file.Files.createTempDirectory("graft_vmodel").toString + "/t"

  test("random DML sequences: every version's read equals the in-memory model") {
    Seq(11L, 42L, 1337L).foreach { seed =>
      val rnd = new Random(seed)
      val dir = dirOf()
      var nextKey = 0L
      def freshRows(n: Int): Seq[(Long, Long)] = {
        val rows = (0 until n).map(i => (nextKey + i, rnd.nextInt(1000).toLong))
        nextKey += n
        rows
      }
      // model: version -> key -> value
      val history = scala.collection.mutable.ArrayBuffer[Map[Long, Long]]()
      // v0: base append
      val base = freshRows(20)
      VersionedTable.commitAppend(spark, base.toDF("k", "x").repartition(3), dir)
      history += base.toMap

      def cur = history.last
      (0 until 18).foreach { _ =>
        rnd.nextInt(9) match {
          case 0 | 1 => // append
            val rows = freshRows(1 + rnd.nextInt(5))
            VersionedTable.commitAppend(spark, rows.toDF("k", "x"), dir)
            history += (cur ++ rows)
          case 2 => // CoW update
            val m = rnd.nextInt(5) + 2
            VersionedTable.commitUpdate(spark, dir,
              pmod(col("k"), lit(m.toLong)) === 0L, Map("x" -> (col("x") + 10000L)))
            history += cur.map { case (k, x) =>
              k -> (if (k % m == 0) x + 10000L else x) }
          case 3 => // CoW delete
            val m = rnd.nextInt(6) + 3
            VersionedTable.commitDelete(spark, dir, pmod(col("k"), lit(m.toLong)) === 1L)
            history += cur.filterNot { case (k, _) => k % m == 1 }
          case 4 => // MoR DV delete
            val m = rnd.nextInt(6) + 3
            VersionedTable.commitDeleteDV(spark, dir, pmod(col("k"), lit(m.toLong)) === 2L)
            history += cur.filterNot { case (k, _) => k % m == 2 }
          case 5 => // MoR DV update
            val m = rnd.nextInt(5) + 2
            VersionedTable.commitUpdateDV(spark, dir,
              pmod(col("k"), lit(m.toLong)) === 0L, Map("x" -> (col("x") - 7L)))
            history += cur.map { case (k, x) =>
              k -> (if (k % m == 0) x - 7L else x) }
          case 6 => // merge: update some existing + insert some fresh
            val existing = cur.keys.toSeq.sorted.take(3).map(k => (k, -k))
            val fresh    = freshRows(2)
            VersionedTable.commitMerge(spark, dir,
              (existing ++ fresh).toDF("k", "x"), Seq("k"))
            history += (cur ++ existing ++ fresh)
          case 7 => // compact (dataChange=false: rows identical)
            VersionedTable.commitCompact(spark, dir, targetFiles = 2)
            history += cur
          case 8 => // restore to a random earlier version
            val toV = rnd.nextInt(history.size).toLong
            VersionedTable.commitRestore(spark, dir, toV)
            history += history(toV.toInt)
        }
        // occasionally compact sidecars — metadata-only, NO new version
        // is guaranteed (no-op when already compact), so resync the model
        // length to the table's version count
        if (rnd.nextInt(4) == 0) {
          val v = VersionedTable.compactDeletionVectors(spark, dir)
          while (history.size <= v) history += cur
        }
      }

      // THE check: every version reads back exactly its model snapshot
      history.zipWithIndex.foreach { case (model, v) =>
        val got = VersionedTable.read(spark, dir, Some(v.toLong))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == model,
          s"seed=$seed version=$v: table=${got.size} rows, model=${model.size}; " +
            s"diff keys: ${(got.keySet.diff(model.keySet) ++ model.keySet.diff(got.keySet)).take(5)}; " +
            s"value diffs: ${model.collect { case (k, x) if got.get(k).exists(_ != x) =>
              (k, x, got(k)) }.take(5)}")
      }
      // and the change feed over the whole span replays to the final state
      val latest = history.size - 1L
      val feed = VersionedTable.changes(spark, dir, 0L, latest, Seq("k"), Seq("x"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
      val replayed = scala.collection.mutable.Map[Long, Long](history.head.toSeq: _*)
      feed.sortBy(_._2).foreach {
        case (k, _, "added", Some(x))   => replayed(k) = x
        case (k, _, "updated", Some(x)) => replayed(k) = x
        case (k, _, "removed", _)       => replayed.remove(k)
        case other                      => sys.error(s"unexpected feed row: $other")
      }
      assert(replayed.toMap == history.last,
        s"seed=$seed: change-feed replay diverges from the final state")
    }
  }
}
