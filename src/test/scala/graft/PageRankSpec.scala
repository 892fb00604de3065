package graft

import org.apache.spark.sql.functions._

import graft.graph.PageRank

/** Integer PageRank (graph/PageRank.scala) vs a driver-side reference
  * model with identical integer semantics: multi-edges weighted,
  * self-loops ordinary, dangling mass leaked, rank div deg shares.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000L

  /** Reference: same integer arithmetic, naive maps. */
  private def model(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = Scale * 15L / 100L
    var rank = nodes.map(_ -> Scale).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => rank(s) / deg(s) }.sum
      }
      rank = nodes.map(n => n -> (base + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.ranksInt(edges.toDF("src", "dst").repartition(3), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("directed cycle keeps full rank exactly") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(run(cycle, 4) == Map(1L -> Scale, 2L -> Scale, 3L -> Scale))
  }

  test("star, dangling leaves, multi-edge, self-loop match the model") {
    // 1 fans out to 2,3 (3 twice: multi-edge weight), 2 loops on itself,
    // 4 is dangling (in-edges only), 5 isolated via self-loop
    val g = Seq((1L, 2L), (1L, 3L), (1L, 3L), (2L, 2L), (3L, 4L), (5L, 5L))
    for (it <- Seq(1, 3, 6)) {
      assert(run(g, it) == model(g, it), s"iters=$it")
    }
  }

  test("personalized variant: teleport and init mass only on seeds") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L))
    val seeds = Set(1L)
    val base = Scale * 15L / 100L
    // reference with seed-restricted base/init
    val nodes = Seq(1L, 2L, 3L, 4L)
    val deg = g.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var rank = nodes.map(n => n -> (if (seeds(n)) Scale else 0L)).toMap
    for (_ <- 1 to 4) {
      val in = g.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => rank(s) / deg(s) }.sum
      }
      rank = nodes.map(n => n ->
        ((if (seeds(n)) base else 0L) + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    val got = graft.graph.PageRank.ranksInt(
        g.toDF("src", "dst").repartition(3), 4,
        seeds = Some(col("id") === 1L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == rank)
    assert(got(1L) > got(2L)) // the seed outranks everything downstream
    assert(got(2L) == got(4L)) // both exactly one hop from the seed
  }

  test("chain leaks dangling mass (total mass decreases)") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val r = run(chain, 5)
    assert(r == model(chain, 5))
    assert(r.values.sum < 4 * Scale) // node 4 has no out-edges: leak
  }
}
