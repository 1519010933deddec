package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Contract tests for the graph operators on hand-built graphs with
  * pencil-and-paper answers (SURVEY.md §2 #99-100).
  */
class GraphSpec extends GraftSpec {

  test("triangle census: K4 has 4 triangles, transitivity 1") {
    val sp = spark
    import sp.implicits._
    // complete graph on 4 nodes: C(4,3)=4 triangles, every wedge closed
    val und = (for {
      a <- 1 to 4; b <- 1 to 4 if a < b
    } yield (a.toLong, b.toLong)).toDF("pa", "pb")
    val r = Graph.trianglesFrom(und).collect().head
    assert(r.getAs[Long]("n_nodes") == 4L)
    assert(r.getAs[Long]("n_edges") == 6L)
    assert(r.getAs[Long]("n_wedges") == 12L)
    assert(r.getAs[Long]("n_triangles") == 4L)
    assert(r.getAs[Double]("transitivity") == 1.0)
  }

  test("triangle census: a path graph has none") {
    val sp = spark
    import sp.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("pa", "pb")
    val r = Graph.trianglesFrom(und).collect().head
    assert(r.getAs[Long]("n_triangles") == 0L)
    assert(r.getAs[Double]("transitivity") == 0.0)
  }

  test("pagerank: symmetric 2-cycle fixes rank at 1.0 every iteration") {
    val sp = spark
    import sp.implicits._
    // r=1 start; each node forwards its whole rank: 0.15 + 0.85*1 = 1.0
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Graph.pagerankFrom(e, iters = 3).collect()
    assert(r.map(_.getAs[Double]("pagerank")).toSeq == Seq(1.0, 1.0))
  }

  test("pagerank: star center accumulates leaf mass") {
    val sp = spark
    import sp.implicits._
    // undirected star 0-{1,2,3}: after iter1 center = .15+.85*3=2.7,
    // leaves = .15+.85*(1/3)=.4333...; ranks sum to N each iteration
    val und = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = Graph.pagerankFrom(e, iters = 1).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("pagerank")).toMap
    assert(out(0L) == 2.7)
    // output is r4-rounded, so compare at 4dp granularity
    assert(math.abs(out(1L) - (0.15 + 0.85 / 3.0)) < 5e-5)
    // mass conservation (damping redistributes, total stays N)
    val total = Graph.pagerankFrom(e, iters = 3).collect()
      .map(_.getAs[Double]("pagerank")).sum
    assert(math.abs(total - 4.0) < 4 * 5e-5)
  }
}
