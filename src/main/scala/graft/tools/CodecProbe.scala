package graft.tools

import graft.ops.Multimodal._

/** Standalone (no-Spark) probe for the JDK GIF multi-frame codec path:
  * encodes the deterministic synthetic clips, decodes them back through the
  * real ImageReader, and checks every frame against the generation rule.
  * Run: java -cp classes:spark-jars graft.tools.CodecProbe
  */
object CodecProbe {
  def main(a: Array[String]): Unit = {
    val ids = (0L to 23L) ++ Seq(59999L, 123456L)
    val encoded = gifEncodeFn(ids.map(IdRow(_)).iterator).toSeq
    val hdr = new String(encoded.head.payload.take(6), "US-ASCII")
    println(s"encoded ${encoded.size} clips, header=$hdr, " +
      s"bytes=${encoded.map(_.payload.length).sum}")
    val frames = gifFramesFn(encoded.iterator).toSeq
    var bad = 0
    frames.foreach { f =>
      val id = f.doc_id
      val (w, h) = ((2 + (id % 5) * 2).toInt, (2 + (id % 3) * 3).toInt)
      val n = w * h
      val expect = (0 until n).map(k =>
        ((id * 17 + f.frame_idx.toLong * 101 + k.toLong * 3) % 256).toDouble)
        .sum
      if (f.width != w || f.height != h || f.luma_sum != expect) {
        bad += 1
        println(s"MISMATCH $f expect w=$w h=$h luma=$expect")
      }
    }
    val expFrames = ids.map(2 + _ % 4).sum
    println(s"frames=${frames.size} expected=$expFrames bad=$bad")
    require(bad == 0 && frames.size == expFrames, "GIF round-trip FAILED")
    println("GIF round-trip OK")
  }
}
