package graft

import graft.operators.Graphs

/** Degree-oriented triangle census laws on known graphs. */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def census(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) =
    Graphs.triangleCensus(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long)].head()

  test("K4: 4 vertices, 6 edges, 12 wedges, 4 triangles") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(census(k4) == ((4L, 6L, 12L, 4L)))
  }

  test("star graph: many wedges, zero triangles") {
    val star = (2L to 11L).map(i => (1L, i))
    assert(census(star) == ((11L, 10L, 45L, 0L)))
  }

  test("duplicate, reversed, and self-loop edges are canonicalized away") {
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 3L))
    assert(census(tri) == ((3L, 3L, 3L, 1L)))
  }

  test("two disjoint triangles sharing no vertex") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 20L), (20L, 30L), (10L, 30L))
    assert(census(g) == ((6L, 6L, 6L, 2L)))
  }

  test("triangle with a pendant: wedge count includes the open wedge") {
    // vertices 1-2-3 closed, 4 hangs off 1: deg(1)=3 → C(3,2)=3 wedges
    // at vertex 1, plus 1 each at 2 and 3 → 5 wedges, 1 triangle
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))
    assert(census(g) == ((4L, 4L, 5L, 1L)))
  }
}
