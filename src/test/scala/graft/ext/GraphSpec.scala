package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** PageRank kernel semantics: exact agreement with a local sequential
  * replay of the scaled-integer recurrence, plus the structural
  * properties the fixture graph implies.
  */
class GraphSpec extends SparkSuite {

  private def localPageRank(
      nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val scale = Graph.rankScale
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val inbox = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) inbox(d) += r(s) / outdeg(s)
      r = nodes.map(n => n -> (scale * 15 / 100 + 85 * inbox(n) / 100)).toMap
    }
    r
  }

  test("pageRank matches a local sequential replay of the integer recurrence") {
    import spark.implicits._
    // hand-built graph incl. a dangling node (3) and a rank sink (4)
    val nodes = Seq(1L, 2L, 3L, 4L, 5L)
    val edges = Seq((1L, 2L), (1L, 4L), (2L, 4L), (5L, 4L), (4L, 5L))
    val out = Graph.pageRank(
        nodes.toDF("id"), edges.toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank_scaled")).toMap
    val expected = localPageRank(nodes, edges, iters = 4)
    assert(out === expected)
    // the 4↔5 cycle keeps the bulk of the mass oscillating between its
    // two members — both outrank every out-of-cycle node at any parity —
    // and the unreferenced dangling node (3) sits at pure teleport rank
    val outside = Seq(1L, 2L, 3L).map(out)
    assert(Seq(4L, 5L).map(out).min > outside.max)
    assert(out(3L) === Graph.rankScale * 15 / 100)
  }

  test("purchase-graph ranks: suppliers absorb rank, customers stay at teleport") {
    val out = Graph.qGraphPagerank(spark, sf).collect()
    val (supp, cust) = out.partition(_.getAs[String]("kind") == "supplier")
    assert(supp.nonEmpty && cust.nonEmpty)
    val teleport = Graph.rankScale * 15 / 100
    // customers have no in-edges: exactly the teleport floor after any
    // number of iterations
    cust.foreach(r => assert(r.getAs[Long]("rank_scaled") === teleport))
    // every supplier with buyers outranks the teleport floor
    assert(supp.map(_.getAs[Long]("rank_scaled")).max > teleport)
    // rank mass never exceeds the injected total (dangling + floor loss only)
    val total = out.map(_.getAs[Long]("rank_scaled")).sum
    assert(total <= Graph.rankScale * out.length)
  }

  test("shortestPaths matches a local BFS on a hand-built graph") {
    import spark.implicits._
    // 1-2-3-4-5 path, 6 isolated, plus a 1→4 shortcut
    val nodes = (1L to 6L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
    val out = Graph.shortestPaths(nodes, edges.toDF("src", "dst"),
        Seq(1L).toDF("id"), maxHops = 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("hops")).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L,
      6L -> Graph.unreached))
  }

  test("purchase-graph reach: bipartite parity and the 4-hop bound hold") {
    val out = Graph.qGraphReach(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val hops = r.getAs[Long]("hops")
      assert(hops >= 0 && hops <= 4)
      // edges only cross the customer/supplier bipartition: supplier
      // distances are even, customer distances odd
      if (r.getAs[String]("kind") == "supplier") assert(hops % 2 === 0)
      else assert(hops % 2 === 1)
    }
    // the sources themselves (and only they) are at distance zero
    val nSources = graft.model.Tables.supplier(spark, sf)
      .filter(org.apache.spark.sql.functions.col("s_suppkey") <= 2).count()
    assert(out.count(r => r.getAs[Long]("hops") == 0L) === nSources)
  }

  test("triangles: per-part counts match a local brute-force enumeration") {
    import org.apache.spark.sql.functions.col
    val out = Graph.qGraphTriangles(spark, sf).collect()
      .map(r => r.getAs[Long]("part_id") -> r.getAs[Long]("n_triangles")).toMap
    val pairs = graft.model.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val verts = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val local = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- verts.indices; j <- (i + 1) until verts.length
      if edges.contains((verts(i), verts(j)))
      k <- (j + 1) until verts.length
      if edges.contains((verts(j), verts(k))) && edges.contains((verts(i), verts(k)))
    } {
      local(verts(i)) += 1; local(verts(j)) += 1; local(verts(k)) += 1
    }
    assert(out === local.toMap)
    // participation counts 3-cover the triangle set
    assert(out.values.sum % 3 === 0)
    assert(out.nonEmpty) // co-order graph is dense enough to have triangles
  }

  test("determinism: two runs at different parallelism agree bit-for-bit") {
    import spark.implicits._
    val nodes = (1L to 40L).toDF("id")
    val edges = (1L to 39L).map(i => (i, i + 1)) ++ Seq((40L, 1L), (7L, 3L), (20L, 3L))
    val a = Graph.pageRank(nodes, edges.toDF("src", "dst"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Graph.pageRank(nodes.repartition(7), edges.toDF("src", "dst").repartition(5), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a === b)
  }

  test("k-core peel matches a local round-by-round replay; invariants hold") {
    import org.apache.spark.sql.functions.col
    val out = Graph.qGraphKcore(spark, sf).collect()
      .map(r => r.getAs[Long]("node_id") -> r.getAs[Long]("deg")).toMap
    val fwd = graft.model.Tables.orders(spark, sf)
      .join(graft.model.Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1) + Graph.supplierIdOffset))
    // local replay: 4 peel rounds over the doubled edge set
    var es = (fwd ++ fwd.map(e => (e._2, e._1))).toSet
    for (_ <- 1 to 4) {
      val deg = es.groupBy(_._1).map { case (n, g) => n -> g.size }
      val kept = deg.filter(_._2 >= 3).keySet
      es = es.filter(e => kept(e._1) && kept(e._2))
    }
    val local = es.groupBy(_._1).map { case (n, g) => n -> g.size.toLong }
    assert(out === local)
    // the peel is monotone: survivors are a subset of round-0 nodes and
    // within-core degree never exceeds the raw degree
    val raw = (fwd ++ fwd.map(e => (e._2, e._1))).groupBy(_._1)
      .map { case (n, g) => n -> g.map(_._2).distinct.size.toLong }
    out.foreach { case (n, d) => assert(d <= raw(n), s"node $n") }
  }

  test("fixpoint property on a crafted graph: a clique core survives, pendants peel off") {
    import spark.implicits._
    // K5 clique (ids 1-5) + a pendant chain 6-7-8 hanging off node 1:
    // the chain must peel away within 3 rounds, the clique must remain
    // intact with degree 4
    val clique = for { i <- 1L to 5L; j <- 1L to 5L if i != j } yield (i, j)
    val chain = Seq((1L, 6L), (6L, 1L), (6L, 7L), (7L, 6L), (7L, 8L), (8L, 7L))
    val out = Graph.kCorePeel((clique ++ chain).toDF("src", "dst"), k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === (1L to 5L).map(_ -> 4L).toMap)
  }
}
