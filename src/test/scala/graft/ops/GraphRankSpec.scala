package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Dedup.graphRank vs an exact in-memory fixed-point model. The integer
  * arithmetic contract means the distributed result must equal the local
  * model BIT-FOR-BIT (no epsilon), on adversarial shapes: stars (degree
  * asymmetry), regular graphs (uniform fixpoint), disjoint mixes, and a
  * seeded random graph. Also pins wire-stepped == direct (the per-round
  * plan survives produce→encode→decode→consume, incl. the DIV operator).
  */
class GraphRankSpec extends SparkTestBase {

  /** Local replay of the exact integer recurrence. */
  private def model(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val deg = und.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    var rank: Map[Long, Long] = deg.map { case (u, _) => u -> Dedup.RankUnit }
    for (_ <- 1 to iters) {
      val sums = und.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => rank(u) / deg(u) }.sum
      }
      rank = sums.map { case (v, s) => v -> (Dedup.RankBase + (85L * s) / 100L) }
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], wire: Boolean): Map[Long, Long] = {
    import spark.implicits._
    Dedup.graphRank(edges.toDF("id_a", "id_b"), iters = 3,
        stepThroughWire = wire)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("star: hub outranks leaves, exact units match the model") {
    val star = (1L to 20L).map(i => (100L, 100L + i))
    val got = run(star, wire = false)
    assert(got == model(star, 3), "star units")
    val hub = got(100L)
    (1L to 20L).foreach(i => assert(hub > got(100L + i),
      s"hub must outrank leaf ${100L + i}"))
  }

  test("regular graphs reach the uniform fixpoint (clique + pair)") {
    val clique = for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b)
    val pair = Seq((50L, 51L))
    val got = run(clique ++ pair, wire = false)
    assert(got == model(clique ++ pair, 3), "units")
    // every node of a regular component emits exactly what it receives, so
    // ranks stay uniform WITHIN each component (absolute value drifts down
    // a few units per round from the integer floors — that loss is part of
    // the exact contract, not error)
    val cliqueRanks = (1L to 5L).map(got).toSet
    val pairRanks = Seq(50L, 51L).map(got).toSet
    assert(cliqueRanks.size == 1, s"clique not uniform: $cliqueRanks")
    assert(pairRanks.size == 1, s"pair not uniform: $pairRanks")
  }

  test("seeded random graph matches the model bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(e => e._1 != e._2).distinct
    assert(run(edges, wire = false) == model(edges, 3), "random-80")
  }

  test("wire-stepped rounds equal the direct run exactly") {
    val rnd = new scala.util.Random(13)
    val edges = Seq.fill(120)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).distinct
    assert(run(edges, wire = true) == run(edges, wire = false),
      "wire-stepped drifted from direct")
  }

  test("the rank column is exactly units / 2^20") {
    import spark.implicits._
    val df = Dedup.graphRank(Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b"),
      iters = 2)
    df.collect().foreach { r =>
      assert(r.getDouble(2) == r.getLong(1).toDouble / Dedup.RankUnit.toDouble)
    }
  }

  test("iters out of range rejects loudly") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      Dedup.graphRank(Seq((1L, 2L)).toDF("id_a", "id_b"), iters = 0)
    }
    assert(e.getMessage.contains("iters"))
  }
}
