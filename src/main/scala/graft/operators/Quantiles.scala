package graft.operators

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persistable per-group QUANTILE sketches (Apache DataSketches KLL, the
  * library Spark itself bundles for its `hll_*` functions) — the rank-query
  * twin of `Relational.distinctSketches`: build tiny mergeable sketches per
  * batch/day/source, persist the bytes like any column, then union ANY
  * grouping of them later and read off percentiles WITHOUT re-reading the
  * data. Together the two close the incremental-statistics loop: HLL gives
  * "distinct so far", KLL gives "distribution so far" (p50/p90/p99 latency,
  * doc-length, score), both at O(KB) per group per batch.
  *
  * Error contract: a KLL sketch with parameter k=200 answers any rank query
  * within ±1.65% NORMALIZED RANK error (99% confidence) — the value returned
  * for p50 is a value whose true rank lies in [48.35%, 51.65%]. Error is on
  * the rank, never the value; merging never degrades the bound. Compaction
  * is randomized, so exact bytes vary run-to-run — results carry a
  * rank-tolerance contract (spec'd against exact percentiles), not a
  * bit-equality one; this is inherent to every mergeable quantile sketch.
  *
  * 100 TB shape: [[quantileSketches]] is TWO-PHASE — each input task folds
  * its rows into local per-group sketches (a map-side combine), so only
  * O(groups × sketch) bytes ever shuffle; the raw value column never does.
  * [[mergeSketches]]/[[sketchQuantiles]] then touch only sketch bytes —
  * re-grouping a year of daily sketches is a metadata-sized job.
  */
object Quantiles {

  /** Default KLL parameter: ±1.65% rank error @99%, ~5 KB per sketch. */
  val DefaultK = 200

  private def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  /** Build one KLL sketch of `valueCol` per `groupCols` combination.
    * Nulls are skipped, and a group whose values are ALL null emits NO
    * sketch row (it has no distribution to sketch) — NOTE this deviates
    * from SQL GROUP BY, which would emit the group with a NULL aggregate;
    * a monitoring join must outer-join its stratum list. The per-task group map
    * assumes bounded group cardinality per task (corpus strata: languages,
    * sources, days) — the same contract as any map-side combine. */
  def quantileSketches(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = DefaultK): DataFrame = {
    require(groupCols.nonEmpty, "quantileSketches: need at least one group column")
    val nG = groupCols.size
    val proj = df.select(groupCols.map(c => col(c)) :+ col(valueCol).cast("double").as("__v"): _*)
    val outSchema = StructType(proj.schema.fields.dropRight(1) :+
      StructField("sketch", BinaryType, nullable = false))
    // phase 1: per-task partial sketches — raw values never shuffle
    val partials = proj.mapPartitions { rows =>
      val m = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], KllDoublesSketch]
      rows.foreach { r =>
        if (!r.isNullAt(nG)) {
          val key = keyOf(r, nG)
          m.getOrElseUpdate(key, KllDoublesSketch.newHeapInstance(k)).update(r.getDouble(nG))
        }
      }
      m.iterator.map { case (key, sk) => Row.fromSeq(key :+ sk.toByteArray) }
    }(Encoders.row(outSchema))
    // phase 2: merge partials into one sketch per group
    mergeSketches(partials, groupCols, k)
  }

  /** Merge persisted sketches to (possibly coarser) `groupCols` — one
    * sketch row per group out. Union is over sketch STATE: merging a year
    * of daily sketches costs a metadata-sized shuffle and keeps the rank
    * bound of the parameter `k`. */
  def mergeSketches(sketches: DataFrame, groupCols: Seq[String], k: Int = DefaultK,
      sketchCol: String = "sketch"): DataFrame = {
    val nG = groupCols.size
    val proj = sketches.select(groupCols.map(c => col(c)) :+ col(sketchCol).as("sketch"): _*)
    proj.repartition(groupCols.map(col): _*)
      .sortWithinPartitions(groupCols.map(col): _*)
      .mapPartitions { rows =>
        // consecutive sorted runs = groups (the TarShards/writeShards trick:
        // one pass, no per-group materialization)
        val it = rows.buffered
        new Iterator[Row] {
          def hasNext: Boolean = it.hasNext
          def next(): Row = {
            val first = it.next()
            val k0 = keyOf(first, nG)
            val acc = KllDoublesSketch.newHeapInstance(k)
            acc.merge(heapify(first.getAs[Array[Byte]](nG)))
            while (it.hasNext && keyOf(it.head, nG) == k0)
              acc.merge(heapify(it.next().getAs[Array[Byte]](nG)))
            // keys re-emit their ORIGINAL values (keyOf wraps binary for
            // comparability only)
            Row.fromSeq((0 until nG).map(first.get) :+ acc.toByteArray)
          }
        }
      }(Encoders.row(proj.schema))
  }

  /** Read quantiles off (already per-group-unique) sketch rows: one output
    * row per group with `n` (exact stream length — KLL tracks it exactly)
    * and one `p<rank>` column per requested rank. */
  def sketchQuantiles(sketches: DataFrame, groupCols: Seq[String], ranks: Seq[Double],
      sketchCol: String = "sketch"): DataFrame = {
    require(ranks.nonEmpty && ranks.forall(r => r >= 0 && r <= 1),
      s"ranks must be in [0,1]: $ranks")
    val nG = groupCols.size
    val proj = sketches.select(groupCols.map(c => col(c)) :+ col(sketchCol).as("sketch"): _*)
    val outSchema = StructType(proj.schema.fields.dropRight(1) ++
      (StructField("n", LongType, nullable = false) +:
        ranks.map(r => StructField(rankName(r), DoubleType, nullable = false))))
    proj.mapPartitions { rows =>
      rows.map { r =>
        val sk = heapify(r.getAs[Array[Byte]](nG))
        Row.fromSeq((0 until nG).map(r.get) ++
          (sk.getN +: ranks.map(q => sk.getQuantile(q))))
      }
    }(Encoders.row(outSchema))
  }

  /** Group key with VALUE equality for binary columns: Seq[Any] equality
    * is reference equality for Array[Byte], so a BinaryType group column
    * would never merge (every input row its own "group") — wrap arrays as
    * Seqs, which compare element-wise. */
  private def keyOf(r: Row, nG: Int): Seq[Any] =
    (0 until nG).map { i =>
      r.get(i) match {
        case a: Array[Byte] => a.toSeq
        case other          => other
      }
    }

  private def rankName(r: Double): String = {
    // BigDecimal, not raw IEEE: 0.07*100 is 7.000000000000001 in doubles,
    // which would mangle the column to p7_000000000000001 — consumers
    // selecting "p7" then fail on a missing column
    val pct = (BigDecimal(r) * 100).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    if (pct.isWhole) s"p${pct.toLongExact}"
    else s"p${pct.bigDecimal.stripTrailingZeros.toPlainString.replace('.', '_')}"
  }
}
