package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph operators over an edge-list DataFrame. Companion to
  * the connected-components pass in [[Dedup]]; same design rules — ranks
  * and edges shuffle as skinny (long, long) pairs, payloads never ride
  * along, and iteration count is a bounded explicit parameter.
  */
object Graph {

  /** PageRank with FIXED-POINT integer arithmetic (damping 0.85, rank unit
    * = `scale` micro-units): per iteration every node sends
    * `floor(rank·85 / (100·outdeg))` to each out-neighbor and collects
    * `0.15·scale + Σ incoming`. Long division/summation only — no float
    * accumulation — so after any number of iterations the ranks are
    * BIT-IDENTICAL across engines, partitionings, and run orders (a
    * float-valued PageRank's shuffle-order sums are not reproducible, the
    * same rationale as TextAnalysis.tfIdf's ratio idf). Dangling-node mass
    * is dropped rather than redistributed (documented deviation from the
    * redistribute-uniformly variant; ranks therefore sum below the
    * theoretical total — fine for ranking use).
    *
    * Edges are deduplicated to a simple directed graph; self-loops are
    * legal and feed a node's own next rank.
    *
    * Scale shape (100 TB): each iteration is ONE join of ranks against the
    * degree-annotated edges on `src` plus ONE (dst → sum) aggregation —
    * both shuffles carry only (long, long) pairs. The edge relation is
    * computed once and reused every round (at cluster scale: persist it
    * bucketed by `src` so the per-iteration join is exchange-free on the
    * edge side); rounds are a bounded explicit parameter exactly like
    * `Dedup.connectedComponents`' propagation budget. */
  def pageRankFixedPoint(
      edgesIn: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      scale: Long = 1000000L,
      dampingPct: Long = 85L): DataFrame = {
    require(iterations >= 1 && iterations <= 20, s"iterations in [1,20], got $iterations")
    require(scale > 0 && dampingPct > 0 && dampingPct < 100)
    val edges = edgesIn
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val degEdges = edges.join(
      edges.groupBy("src").agg(count(lit(1)).as("deg")), "src")
    val base = scale - scale * dampingPct / 100L

    var ranks = nodes.withColumn("r", lit(scale))
    for (_ <- 1 to iterations) {
      // `div` = integral division (Spark's `/` on longs returns DOUBLE);
      // all operands positive, so truncation ≡ the oracle's floor `//`
      val contrib = degEdges.join(ranks, col("src") === col("node"))
        .selectExpr("dst AS node", s"r * $dampingPct div (100 * deg) AS c")
        .groupBy("node").agg(sum(col("c")).as("s"))
      ranks = nodes.join(contrib, Seq("node"), "left_outer")
        .select(col("node"), (lit(base) + coalesce(col("s"), lit(0L))).as("r"))
    }
    ranks
  }

  /** Global triangle count over the UNDIRECTED simple graph (direction and
    * duplicate edges collapsed, self-loops dropped) — Schank's forward
    * algorithm relationally: orient every edge from its (degree, id)-
    * smaller endpoint to the larger, generate wedges at each source, and
    * close a wedge iff the oriented edge between its two targets exists.
    * Each triangle forms its wedge at exactly one vertex (its ≺-smallest),
    * so the count is exact with no post-division.
    *
    * The orientation IS the 100 TB skew-killer: a hub of degree d forms
    * O(d²) wedges in the naive id-ordered plan, but almost all of a hub's
    * edges orient TOWARD it (hubs lose the degree comparison), so wedge
    * fan-out concentrates at low-degree vertices — Σ min(deg_u, deg_v) per
    * edge, the forward-algorithm bound. All three shuffles (dedup, degree
    * join, wedge-close join) carry (long, long[, long]) rows only.
    *
    * Output: 1 row (n_nodes, n_edges, n_triangles) — all exact integers,
    * fully oracle-checkable against the canonical u<v<w triple count. */
  def triangleCount(edgesIn: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edgesIn
      .select(least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("u"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("v"))
      .where(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct()
    val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // orient a -> b where (deg_a, a) < (deg_b, b); carry the target's
    // degree so the wedge comparison needs no further join
    val oriented = e
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b"), col("dv").as("db")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"), col("du").as("db")))
          .as("o"))
      .select(col("o.a").as("a"), col("o.b").as("b"), col("o.db").as("db"))
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.a") === col("e2.a") &&
          (col("e1.db") < col("e2.db") ||
            (col("e1.db") === col("e2.db") && col("e1.b") < col("e2.b"))))
      .select(col("e1.b").as("x"), col("e2.b").as("y"))
    val closed = wedges.join(oriented.select(col("a").as("x"), col("b").as("y")), Seq("x", "y"))
    e.agg(count(lit(1)).as("n_edges")).crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
      .crossJoin(closed.agg(count(lit(1)).as("n_triangles")))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }
}
