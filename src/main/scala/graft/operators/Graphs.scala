package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge-list DataFrames. Connected
  * components live in [[Dedup.dupClusters]]; this adds the counting
  * side: degree-oriented triangle and wedge counting, the core of
  * clustering-coefficient / cohesion analytics.
  *
  * Scale: the naive triangle join (E ⋈ E ⋈ E) explodes on high-degree
  * vertices — a celebrity node with degree d contributes d² wedge rows.
  * Degree orientation is the standard fix: orient every edge from its
  * lower-(degree, id) endpoint to the higher one; every vertex's
  * oriented out-degree is then O(√|E|) regardless of its raw degree, so
  * the wedge join's fan-out is bounded and skew-resistant. Each triangle
  * is counted exactly once (its unique minimum-(degree, id) corner emits
  * the wedge; the closing edge check is an equi-join).
  */
object Graphs {

  /** Triangle census of an undirected simple graph given as (a, b) edge
    * rows (self-loops and duplicate/reversed edges tolerated — the edge
    * set is canonicalized first). Returns one row:
    * n_vertices, n_edges, n_wedges, n_triangles. */
  def triangleCensus(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = PlanCache.reuse(edges
      .select(least(col(aCol), col(bCol)).as("u"),
              greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    val deg = e.select(col("u").as("x")).unionAll(e.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("deg"))
    // orient u→v iff (deg, id) of u precedes (deg, id) of v — a total
    // order, so exactly one direction survives per edge
    val oriented = PlanCache.reuse(e
      .join(deg.select(col("x").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("x").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")),
             struct(col("u").as("src"), col("v").as("dst")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst")))
          .as("o"))
      .select(col("o.src"), col("o.dst")))
    // wedges at the oriented source; dst pair ordered by id so each
    // unordered out-neighbor pair appears once
    val wedges = oriented.select(col("src"), col("dst").as("w1"))
      .join(oriented.select(col("src"), col("dst").as("w2")), Seq("src"))
      .filter(col("w1") < col("w2"))
    // closing edge exists in EITHER orientation between w1 and w2
    val closing = oriented
      .select(least(col("src"), col("dst")).as("cu"),
              greatest(col("src"), col("dst")).as("cv"))
    val triangles = wedges
      .join(closing, col("w1") === col("cu") && col("w2") === col("cv"))
    val nTri = triangles.agg(count(lit(1)).as("n_triangles"))
    val nWedge = deg.agg(
      sum(expr("(deg * (deg - 1)) DIV 2")).as("n_wedges"),
      count(lit(1)).as("n_vertices"))
    val nEdge = e.agg(count(lit(1)).as("n_edges"))
    nWedge.crossJoin(nEdge).crossJoin(nTri)
      .select(col("n_vertices"), col("n_edges"), col("n_wedges"),
              col("n_triangles"))
  }
}
