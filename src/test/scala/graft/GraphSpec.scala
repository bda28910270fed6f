package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  test("pageRankFixedPoint: hand-computed star graph, dangling mass dropped") {
    import spark.implicits._
    // a → {b, c, d}; b/c/d dangle
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val r1 = Graph.pageRankFixedPoint(edges, "src", "dst", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a: no in-edges → base 150000; b/c/d: 150000 + floor(1000000·85/300)
    assert(r1 == Map(0L -> 150000L, 1L -> 433333L, 2L -> 433333L, 3L -> 433333L))
    val r2 = Graph.pageRankFixedPoint(edges, "src", "dst", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 2 redistributes a's new rank 150000: floor(150000·85/300) = 42500
    assert(r2 == Map(0L -> 150000L, 1L -> 192500L, 2L -> 192500L, 3L -> 192500L))
  }

  test("pageRankFixedPoint: a cycle is a fixed point at full scale") {
    import spark.implicits._
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    // deg 1 everywhere: r = 150000 + floor(r·85/100) has fixed point 1000000
    val out = Graph.pageRankFixedPoint(cycle, "src", "dst", iterations = 5)
      .collect().map(_.getLong(1)).toSet
    assert(out == Set(1000000L))
  }

  test("pageRankFixedPoint: ranks independent of physical layout, dups collapse") {
    import spark.implicits._
    val edges = (0L until 60L).map(i => (i % 12, (i * 7 + 3) % 12)).toDF("src", "dst")
    def run(df: org.apache.spark.sql.DataFrame) =
      Graph.pageRankFixedPoint(df, "src", "dst", iterations = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run(edges)
    val b = run(edges.repartition(7).unionAll(edges.limit(10))) // dup edges dedup
    assert(a == b, "fixed-point ranks must be layout- and duplicate-invariant")
  }

  test("triangleCount: hand graphs, direction/duplicate/self-loop invariance, brute-force parity") {
    import spark.implicits._
    def tri(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val r = Graph.triangleCount(df, "src", "dst").head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // K4: 4 nodes, 6 edges, 4 triangles — plus noise: reversed duplicates,
    // a self-loop, and a pendant edge that joins no triangle
    val k4 = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),
      (2L,1L),(3L,3L),(4L,9L)).toDF("src","dst")
    assert(tri(k4) == ((5L, 7L, 4L)))
    // a triangle-free path
    assert(tri(Seq((1L,2L),(2L,3L),(3L,4L)).toDF("src","dst")) == ((4L, 3L, 0L)))
    // fixture-scale parity vs the canonical u<v<w brute-force triple join
    val edges = Tables.load(spark, sfDir, "lineitem")
      .select((col("l_partkey") % 50).as("src"), (col("l_suppkey") % 50).as("dst"))
    val e = edges.select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct()
    val brute = e.as("e1")
      .join(e.as("e2"), col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .join(e.as("e3"), col("e3.u") === col("e1.v") && col("e3.v") === col("e2.v"))
      .count()
    assert(tri(edges)._3 == brute, s"forward algorithm vs brute force: ${tri(edges)._3} vs $brute")
  }
}
