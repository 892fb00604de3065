package graft

import graft.graph.LabelPropagation

/** Deterministic synchronous LPA (graph/LabelPropagation.scala) vs a
  * driver-side reference with identical tie-break semantics.
  */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def model(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (n, es) => n -> es.map(_._2) }
    var lbl = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      lbl = adj.map { case (n, nbs) =>
        val counts = nbs.groupBy(lbl).map { case (l, xs) => (l, xs.size) }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lbl
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LabelPropagation.labels(edges.toDF("src", "dst").repartition(3), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cliques joined by a bridge split into two communities") {
    val cliqueA = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val g = cliqueA ++ cliqueB :+ (4L, 11L)
    val got = run(g, 4)
    assert(got == model(g, 4))
    // everyone in clique A shares a label; everyone in B shares another
    assert((1L to 4L).map(got).toSet.size == 1)
    assert((11L to 14L).map(got).toSet.size == 1)
    assert(got(1L) != got(12L))
  }

  test("ties resolve to the smallest label (pure function of the graph)") {
    // path 1-2-3: node 2 sees labels {1, 3} equally often -> takes 1
    val got = run(Seq((1L, 2L), (2L, 3L)), 1)
    assert(got(2L) == 1L)
    assert(got == model(Seq((1L, 2L), (2L, 3L)), 1))
  }

  test("matches the model on a pseudo-random graph across iteration counts") {
    val edges = for {
      i <- 0L until 18L; j <- (i + 1) until 18L
      if (i * 29 + j * 13) % 5 == 0
    } yield (i, j)
    for (it <- Seq(1, 2, 3)) {
      assert(run(edges, it) == model(edges, it), s"iters=$it")
    }
  }
}
