package graft

import graft.operators.Clustering
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {

  /** 3 planted centers in 4-d, 20 points each, tight noise — Lloyd from
    * worst-case seeds (the 3 smallest ids all sit in ONE planted cluster
    * region? no: ids interleave the clusters, so seeds straddle). */
  private def planted(parts: Int) = {
    import spark.implicits._
    val centers = Seq(
      Array(10.0, 0.0, 0.0, 0.0), Array(0.0, 10.0, 0.0, 0.0), Array(0.0, 0.0, 10.0, 0.0))
    val rnd = new scala.util.Random(7)
    (0 until 60).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(_ + rnd.nextGaussian() * 0.1), i % 3)
    }.toDF("id", "vec", "truth").repartition(parts)
  }

  test("recovers planted clusters; assignment is partitioning-invariant") {
    val a3 = Clustering.kmeansAssign(planted(3), "id", "vec", k = 3, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val a13 = Clustering.kmeansAssign(planted(13), "id", "vec", k = 3, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a3.sameElements(a13), "physical layout must not change the fit")
    // purity: every truth-cluster maps to exactly one fitted cluster
    val byTruth = a3.groupBy(_._1 % 3).map { case (t, rows) => t -> rows.map(_._2).distinct }
    assert(byTruth.values.forall(_.size == 1), s"impure clusters: $byTruth")
    assert(byTruth.values.flatten.toSet.size == 3, "three distinct fitted clusters")
    // tight noise: every final distance is small
    assert(a3.forall(_._3 < 1.0))
  }

  test("null vectors drop; ids carry through; centroids table is k x dims") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Array(0.0, 0.0))), (2L, Some(Array(0.1, 0.0))),
      (3L, Some(Array(5.0, 5.0))), (4L, None)
    ).toDF("id", "vec")
    val a = Clustering.kmeansAssign(df, "id", "vec", k = 2, iters = 2).collect()
    assert(a.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    val clusters = a.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) == clusters(2L) && clusters(1L) != clusters(3L))
    val cents = Clustering.kmeansCentroids(df, "id", "vec", k = 2, iters = 2).collect()
    assert(cents.length == 4, "2 clusters x 2 dims")
  }

  test("k=1 degenerates to the global mean; iters/k validated") {
    import spark.implicits._
    val df = Seq((1L, Array(0.0, 4.0)), (2L, Array(2.0, 0.0))).toDF("id", "vec")
    val a = Clustering.kmeansAssign(df, "id", "vec", k = 1, iters = 1).collect()
    assert(a.forall(_.getLong(1) == 0L))
    // centroid (1,2): dists = sqrt(1+4) both
    assert(a.forall(r => math.abs(r.getDouble(2) - math.sqrt(5.0)) < 1e-6))
    intercept[IllegalArgumentException] {
      Clustering.kmeansAssign(df, "id", "vec", k = 0, iters = 1)
    }
    intercept[IllegalArgumentException] {
      Clustering.kmeansAssign(df, "id", "vec", k = 1, iters = 0)
    }
  }
}
