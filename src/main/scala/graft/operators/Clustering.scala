package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over an embedding column — the clustering
  * primitive behind corpus organization (topic buckets for mixture
  * sampling, cluster-balanced train splits) and coarse quantization
  * ([[Similarity]]'s IVF uses MLlib's k-means for LEARNED centroids;
  * this operator is the fully-replayable sibling whose every step is
  * cross-engine reproducible, so the whole fit — not just its output
  * shape — oracle-checks against an independent SQL engine).
  *
  * Determinism contract (the reason this exists alongside MLlib):
  *  - seeds = the k rows with the smallest ids (no RNG);
  *  - distances are EUCLIDEAN, rounded to 6 dp before any comparison —
  *    the repo's standard device for making float reductions
  *    order-insensitive across engines (see the cosine top-k oracles);
  *  - argmin ties break on the smaller centroid id;
  *  - centroid updates are per-dimension means rounded to 6 dp.
  *
  * Scale shape (100 TB of vectors): centroids are O(k·d) and ride
  * broadcast — assignment is map-side (one codegen'd pass per point,
  * no shuffle of vectors); the update shuffles only (cluster, dim,
  * partial-sum) cells, map-side combined to ≤ k·d rows per task. Per
  * iteration: one broadcast + one skinny k·d shuffle — vectors never
  * move. Iterations are a driver loop over lazy plans; each iteration's
  * centroid table is localCheckpointed so the lineage does not double
  * per round.
  */
object Clustering {

  /** Run `iters` Lloyd iterations; returns one row per input point:
    * (idCol, cluster, dist) where `dist` is the rounded Euclidean
    * distance to the point's final centroid. Rows with a NULL vector are
    * dropped (they have no position). */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame =
    fitCore(df, idCol, vecCol, k, iters)._1
      .select(col("pid").as(idCol), col("cid").as("cluster"), col("d").as("dist"))

  /** Per-dimension table of the centroids the FINAL assignment was made
    * against — exposed so a fit can be probed/reused (the IVF-build
    * shape). These are exactly [[kmeansAssign]]'s reference points: a
    * probe's nearest-centroid agrees with the fit's own assignment (the
    * previous form re-derived means FROM the final assignment — one Lloyd
    * update ahead of the distances the assignment reported, so an index
    * built from it probed different geometry than the fit assigned). */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame =
    fitCore(df, idCol, vecCol, k, iters)._2
      .select(col("cid").as("cluster"), posexplode(col("c")).as(Seq("p", "m")))

  /** The shared fit: `iters` Lloyd rounds, then one final assignment
    * against the post-loop centroids. Returns (final assignment, the
    * centroid table that assignment used) — the two views MUST come from
    * one fit or they desynchronize by one update step. */
  private def fitCore(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): (DataFrame, DataFrame) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val pts = df
      .select(col(s"`$idCol`").as("pid"), col(s"`$vecCol`").cast("array<double>").as("v"))
      .where(col("pid").isNotNull && col("v").isNotNull)
    // seeds: the k smallest ids, centroid id = rank in that order. The
    // k-row window is post-LIMIT — single-partition is the point, not a
    // scale hazard (one of the engine's four audited global windows, all
    // frame-bounded; GraftSession quiets WindowExec's blanket warning).
    var cents = pts.orderBy("pid").limit(k)
      .select((row_number().over(Window.orderBy("pid")) - 1).cast("long").as("cid"),
        col("v").as("c"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      cents = assign(pts, cents)
        .select(col("cid"), posexplode(col("v")).as(Seq("p", "x")))
        .groupBy("cid", "p").agg(round(avg("x"), 6).as("m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("p"), col("m")))).as("pm"))
        .select(col("cid"), transform(col("pm"), e => e.getField("m")).as("c"))
        .localCheckpoint(true)
    }
    // final positions against the final centroids
    (assign(pts, cents), cents)
  }

  /** Broadcast-assign every point to its nearest centroid: rounded
    * Euclidean distance, ties to the smaller centroid id. Keeps (pid, v,
    * cid, d); `min(struct(d, cid))` is the argmin — no window, one
    * map-side-combined aggregation. */
  private def assign(pts: DataFrame, cents: DataFrame): DataFrame = {
    val d0 = round(
      sqrt(aggregate(zip_with(col("v"), col("c"), (x, y) => (x - y) * (x - y)),
        lit(0.0), _ + _)), 6)
    // a dimension mismatch nulls the fold, and a null distance sorts
    // FIRST in the struct-min — the malformed point would silently "win"
    // cluster 0 and skew its means for every later round; refuse per row
    val d = when(size(col("v")) =!= size(col("c")),
      raise_error(concat(lit("kmeans: vector of dim "),
        size(col("v")).cast("string"),
        lit(" does not match centroid dim "),
        size(col("c")).cast("string")))).otherwise(d0)
    pts.crossJoin(broadcast(cents))
      .select(col("pid"), col("v"), struct(d.as("d"), col("cid").as("cid")).as("dc"))
      .groupBy("pid").agg(min(col("dc")).as("best"), first(col("v")).as("v"))
      .select(col("pid"), col("v"),
        col("best.cid").as("cid"), col("best.d").as("d"))
  }
}
