package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Dedup.connectedComponents vs a local union-find over adversarial graph
  * shapes: long chains (pointer-doubling must converge well under the
  * iteration cap), stars, disjoint cliques, and a seeded random graph.
  */
class ConnectedComponentsSpec extends SparkTestBase {

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = min of component; path-compress to roots first
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  private def check(edges: Seq[(Long, Long)], clue: String): Unit = {
    import spark.implicits._
    val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(edges), clue)
  }

  test("long chain collapses to its minimum (pointer doubling)") {
    check((0L until 200L).map(i => (i, i + 1)), "chain-201")
  }

  test("stars, cliques, chains and singleton pairs mix") {
    val star = (1L to 30L).map(i => (500L + i, 500L))
    val clique = for { a <- 100L to 110L; b <- (a + 1) to 110L } yield (a, b)
    val chain = (200L until 240L).map(i => (i + 1, i)) // reversed direction
    val pairs = Seq((900L, 901L), (950L, 951L))
    check(star ++ clique ++ chain ++ pairs, "mixed shapes")
  }

  test("seeded random graph matches union-find") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(e => e._1 != e._2)
    check(edges, "random-120")
  }

  test("incremental CC == from-scratch CC under arbitrary old/new edge splits") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(250)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
      .filter(e => e._1 != e._2).distinct
    val scratch = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (splitAt <- Seq(0.2, 0.5, 0.9)) {
      val n = (edges.size * splitAt).toInt
      val (oldE, newE) = edges.splitAt(n)
      val oldLabels = Dedup.connectedComponents(oldE.toDF("id_a", "id_b"))
      val inc = Dedup.incrementalConnectedComponents(oldLabels,
          newE.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(inc == scratch, s"split $splitAt diverged from from-scratch")
    }
    // empty new batch: incremental over stars reproduces the old labels
    val oldLabels = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
    val idem = Dedup.incrementalConnectedComponents(oldLabels,
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(idem == scratch, "empty ingest must be a fixpoint")
  }

  test("reliable checkpoint path (checkpointDir) converges identically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val edges = (0L until 60L).map(i => (i, i + 1)) ++ Seq((200L, 201L))
    val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"),
        checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(edges), "reliable-checkpoint")
    // reliable checkpoints actually landed in the requested directory
    val files = new java.io.File(dir).listFiles()
    assert(files != null && files.nonEmpty, s"no checkpoint data under $dir")
  }

  test("checkpointDir + stepThroughWire: the consumer's iteration rounds checkpoint reliably") {
    // r11 (advice fix): the wire path used to silently downgrade a
    // requested reliable checkpoint to localCheckpoint — the consumer's
    // ExtIteration loop now honors the context's checkpoint dir. Gate:
    // identical fixpoint AND rdd checkpoint data present in the directory.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-wire-ckpt")
    val edges = (0L until 40L).map(i => (i, i + 1)) ++ Seq((300L, 301L))
    val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"),
        checkpointDir = Some(dir.toString), stepThroughWire = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(edges), "wire + reliable-checkpoint fixpoint")
    def count(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(count).sum else 1
    assert(count(dir.toFile) > 1,
      s"no reliable checkpoint data under $dir — the consumer fell back " +
        "to localCheckpoint")
  }

  test("superseded iteration rounds' reliable checkpoint files are deleted (r12)") {
    // the ExtIteration consumer frees each superseded generation — for
    // reliable rounds that means DELETING its rdd-N checkpoint dir, so a
    // long-lived session doesn't accumulate one dir per round per query.
    // A 40-chain needs ~6 double-hop rounds + the fixpoint round: without
    // deletion this leaves 9+ rdd dirs; with it, only the never-superseded
    // frames remain (edges leaf, the host's initial labels, final state).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt-gc")
    val edges = (0L until 40L).map(i => (i, i + 1))
    val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"),
        checkpointDir = Some(dir.toString), stepThroughWire = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(edges), "fixpoint under checkpoint-gc")
    def rddDirs(f: java.io.File): Seq[java.io.File] =
      if (!f.isDirectory) Seq.empty
      else f.listFiles().toSeq.flatMap(rddDirs) ++
        f.listFiles().toSeq.filter(d => d.isDirectory && d.getName.startsWith("rdd-"))
    val left = rddDirs(dir.toFile)
    assert(left.nonEmpty, "expected the surviving frames' checkpoints on disk")
    assert(left.size <= 5,
      s"superseded rounds' checkpoint dirs were not deleted: ${left.size} " +
        s"rdd-* dirs remain under $dir")
  }

  test("iteration reliability is scoped per-consume, not sticky (r12 advice)") {
    // setCheckpointDir is sticky on the shared context (earlier tests in
    // this suite set one). graphRank always wants fast localCheckpoint
    // rounds and passes reliableIteration=Some(false) — so consuming its
    // iteration must write NOTHING into whatever dir is configured.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rank-sticky")
    spark.sparkContext.setCheckpointDir(dir.toString)
    val pairs = ((0L until 30L).map(i => (i, i + 1)) ++ Seq((100L, 101L)))
      .toDF("id_a", "id_b")
    val host = Dedup.graphRank(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wire = Dedup.graphRank(pairs, stepThroughWire = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wire == host, "wire rank == host rank under a sticky dir")
    def anyRdd(f: java.io.File): Boolean =
      f.isDirectory && (f.getName.startsWith("rdd-") ||
        f.listFiles().exists(anyRdd))
    assert(!anyRdd(dir.toFile),
      s"graphRank's scoped Some(false) leaked reliable checkpoints into $dir")
  }

  test("per-round plans ride the wire (stepThroughWire) with identical fixpoint") {
    import spark.implicits._
    val star = (1L to 20L).map(i => (600L + i, 600L))
    val chain = (0L until 50L).map(i => (i, i + 1))
    val edges = star ++ chain
    val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"),
        stepThroughWire = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(edges), "wire-step")
  }

  test("decontaminate removes exactly the docs sharing an n-gram with the benchmark") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, "alpha beta gamma delta unrelated tail"),
      (4L, "short doc")).toDF("doc_id", "text")
    val bench = Seq((100L, "xx alpha beta gamma delta yy")).toDF("doc_id", "text")
    val hits = TextOps.contaminationHits(corpus, bench, n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1 and 3 share the 4-gram "alpha beta gamma delta"
    assert(hits.keySet == Set(1L, 3L), hits.toString)
    val clean = TextOps.decontaminate(corpus, bench, n = 4)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(clean == Seq(2L, 4L))
  }

  test("dedupByClusters keeps exactly one doc per cluster plus unpaired docs") {
    import spark.implicits._
    val docs = (0L to 9L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupByClusters(docs, pairs).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    // clusters {1,2,3} -> keep 1; {7,8} -> keep 7; others untouched
    assert(kept == Seq(0L, 1L, 4L, 5L, 6L, 7L, 9L))
  }
}
