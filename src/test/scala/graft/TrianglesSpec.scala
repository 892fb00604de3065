package graft

import graft.graph.Triangles

/** Degree-oriented triangle counting (graph/Triangles.scala) vs
  * hand-counted graphs and a brute-force reference.
  */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): (Long, Long) = {
    val r = Triangles.count(edges.toDF("src", "dst").repartition(3))
      .collect().head
    (r.getAs[Long]("n_edges"), r.getAs[Long]("n_triangles"))
  }

  /** O(n³) reference on the undirected simple graph. */
  private def brute(edges: Seq[(Long, Long)]): Long = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    nodes.combinations(3).count { case Seq(x, y, z) =>
      und((x, y)) && und((x, z)) && und((y, z))
    }
  }

  test("K4 has 4 triangles; direction, self-loops, multi-edges ignored") {
    val k4 = for (i <- 1L to 4L; j <- 1L to 4L if i != j) yield (i, j)
    val noisy = k4 ++ Seq((1L, 1L), (2L, 2L), (1L, 2L), (1L, 2L))
    assert(run(noisy) == (6L, 4L))
  }

  test("cycles and trees have zero triangles") {
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) == (4L, 0L))
    assert(run(Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L))) == (4L, 0L))
  }

  test("star + one chord closes exactly the chord triangles (skew shape)") {
    // hub 0 connected to 1..20, chord (1,2): one triangle — the shape
    // where un-oriented counting would materialize 20² hub wedges
    val star = (1L to 20L).map(i => (0L, i)) :+ (1L, 2L)
    assert(run(star) == (21L, 1L))
  }

  test("matches brute force on a pseudo-random graph") {
    val edges = for {
      i <- 0L until 15L; j <- (i + 1) until 15L
      if (i * 31 + j * 17) % 3 == 0
    } yield (i, j)
    val (_, tri) = run(edges)
    assert(tri == brute(edges))
    assert(tri > 0L) // the graph is dense enough that zero would be a bug
  }
}
