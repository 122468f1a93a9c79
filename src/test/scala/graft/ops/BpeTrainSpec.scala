package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.{Bpe, BpeLookup}

/** BPE vocabulary training (t36): hand-derived merges on the classic
  * low/lower/newest/widest corpus, partitioning-independence of the
  * learned table, the construction invariant, early stop on a fully
  * coalesced vocabulary, and the load-bearing round-trip — the greedy
  * BpeLookup tokenizer reproduces training's terminal segmentations
  * exactly (learned merges DRIVE t29-style tokenization).
  */
class BpeTrainSpec extends SparkTestBase {

  import BpeTrain.Merge

  private def corpus = {
    import spark.implicits._
    Seq(
      "low low low low low",
      "lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest").toDF("text")
  }

  // Hand derivation (freq-weighted, OVERLAPPING adjacent pairs; ties by
  // count desc then lexicographic):
  //   r0: (e,s)=9 ties (s,t)=9, lex -> es
  //   r1: (es,t)=9 -> est
  //   r2: (l,o)=7 ties (o,w)=7, lex -> lo
  //   r3: (lo,w)=5+2=7 -> low
  //   r4: (e,w)=6 ties (n,e)=6,(w,est)=6, lex -> ew
  private val expected = Seq(
    Merge(0, "e", "s", 9L), Merge(1, "es", "t", 9L),
    Merge(2, "l", "o", 7L), Merge(3, "lo", "w", 7L),
    Merge(4, "e", "w", 6L))

  test("learned merges match the hand-derived classic-corpus table") {
    assert(BpeTrain.learnMerges(corpus, "text", numMerges = 5) == expected)
  }

  test("the learned table is partitioning-independent") {
    val m1 = BpeTrain.learnMerges(corpus.repartition(1), "text", 5)
    val m8 = BpeTrain.learnMerges(corpus.repartition(8), "text", 5)
    assert(m1 == m8 && m1 == expected)
  }

  test("training stops early once the vocabulary fully coalesces") {
    import spark.implicits._
    val tiny = Seq("ab ab ab").toDF("text")
    val m = BpeTrain.learnMerges(tiny, "text", numMerges = 4)
    assert(m == Seq(Merge(0, "a", "b", 3L)),
      s"one merge exhausts a single-bigram vocab: $m")
  }

  test("the wire-looped training (one ExtIteration artifact) is " +
    "bit-identical to the host loop — classic corpus, real documents, " +
    "and the coalesced early-stop shape") {
    def asMerges(df: org.apache.spark.sql.DataFrame): Seq[Merge] =
      df.collect().map(r => Merge(r.getInt(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSeq
    // classic corpus: equals the hand-derived table
    assert(asMerges(BpeTrain.trainMerges(corpus, "text", 5,
      stepThroughWire = true)) == expected)
    // real fixture: wire == host, merge for merge
    graft.Tables.register(spark, sfDir)
    val docs = spark.table("documents")
    val host = asMerges(BpeTrain.trainMerges(docs, "text", 6))
    val wire = asMerges(BpeTrain.trainMerges(docs, "text", 6,
      stepThroughWire = true))
    assert(host == wire, s"wire-trained merges drifted:\n$host\n$wire")
    // fully-coalescing vocab: the argmax goes empty mid-loop and the
    // no-op tail rounds add nothing — same table as the host early stop
    import spark.implicits._
    val tiny = Seq("ab ab ab").toDF("text")
    assert(asMerges(BpeTrain.trainMerges(tiny, "text", 4,
      stepThroughWire = true)) == Seq(Merge(0, "a", "b", 3L)))
  }

  test("learned merges honor the construction invariant and drive greedy " +
    "tokenization to training's exact terminal segmentations") {
    val merges = BpeTrain.learnMerges(corpus, "text", numMerges = 5)
    val table = merges.map(m => (m.left, m.right)).toArray
    Bpe.checkInvariant(table) // throws on violation
    val lookup = new BpeLookup(table)
    val fin = BpeTrain.tokenizedWords(corpus, "text", merges)
      .collect().map(r => (r.getString(0), r.getString(2), r.getInt(3)))
    assert(fin.nonEmpty)
    val symRe = """\(([^()]+)\)""".r
    fin.foreach { case (word, seg, nTok) =>
      val trained = symRe.findAllMatchIn(seg).map(_.group(1)).toList
      val greedy = Bpe.tokenizeWordWith(lookup, word)
      assert(greedy == trained,
        s"'$word': greedy $greedy != trained $trained")
      assert(nTok == trained.size)
    }
  }

  test("training on the real documents table is stable across reruns") {
    graft.Tables.register(spark, sfDir)
    val docs = spark.table("documents")
    val a = BpeTrain.learnMerges(docs, "text", numMerges = 4)
    val b = BpeTrain.learnMerges(docs, "text", numMerges = 4)
    assert(a == b && a.size == 4)
    // merges must be genuinely multi-level on real text eventually — at
    // minimum every operand is a learned product or single char (the
    // invariant), and counts are strictly positive and non-increasing
    assert(a.map(_.cnt).sliding(2).forall(w => w.head >= w.last))
  }
}
