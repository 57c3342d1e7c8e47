package graft

import graft.dedup.Dedup

/** Property-based correctness for the large-star/small-star connected
  * components: on randomly generated graphs (seeded — every CI run sees the
  * same cases) and adversarial shapes, the distributed fixpoint must equal
  * a sequential union-find exactly: same non-isolated node set, same
  * min-id component labels. This is the strongest local evidence for the
  * suite's only iterative-fixpoint algorithm — the DuckDB oracle replays
  * one corpus-derived graph; these replay many hostile ones. */
class GraphPropertySpec extends SparkSpec {

  /** Sequential union-find → Map(node -> min node id of its component),
    * non-isolated nodes only. */
  private def ufLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private def ccLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s2 = spark
    import s2.implicits._
    val (labels, _) = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
    labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("CC equals union-find on seeded random graphs") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 10).foreach { i =>
      val n = 3 + rnd.nextInt(30)
      val m = 1 + rnd.nextInt(50)
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty)
        assert(ccLabels(edges) == ufLabels(edges), s"random graph $i: $edges")
    }
  }

  test("CC equals union-find on adversarial shapes") {
    val chain = (0L until 12L).sliding(2).map(s => (s(1), s(0))).toSeq
    val star = (1L to 10L).map(i => (i, 0L))
    val invStar = (0L until 10L).map(i => (10L, i)) // center has the MAX id
    val twoComps = Seq((1L, 2L), (2L, 3L), (10L, 11L), (12L, 11L))
    val complete = for (a <- 0L until 6L; b <- 0L until a) yield (a, b)
    val dupEdges = Seq((5L, 6L), (6L, 5L), (5L, 6L), (7L, 5L))
    Seq("chain" -> chain, "star" -> star, "inverted star" -> invStar.toSeq,
      "two components" -> twoComps, "complete K6" -> complete.toSeq,
      "duplicate/reversed edges" -> dupEdges).foreach { case (name, es) =>
      assert(ccLabels(es) == ufLabels(es), name)
    }
  }
}
