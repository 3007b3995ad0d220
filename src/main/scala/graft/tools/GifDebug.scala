package graft.tools

import graft.operators.Multimodal

/** Scratch debugging harness for the hand-written GIF encoder: random
  * frame stacks through gifEncodeFrames -> ImageIO decode, first
  * failure dumped with a reference LZW decode of the raw stream so an
  * encoder bug and a spec-misreading separate cleanly. */
object GifDebug {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(11)
    val pal = Array[Byte](0, 85, -86, -1)
    var trial = 0
    while (trial < 5000) {
      val w = 1 + rnd.nextInt(12)
      val h = 1 + rnd.nextInt(12)
      val nf = 1 + rnd.nextInt(3)
      val frames = (0 until nf).map { _ =>
        Array.fill(w * h * 3)(pal(rnd.nextInt(4)))
      }
      val gif = Multimodal.gifEncodeFrames(w, h, frames)
      Multimodal.gifDecodeFrames(gif) match {
        case Some(back) if back.length == nf &&
          back.zip(frames).forall { case ((dw, dh, rgb), want) =>
            dw == w && dh == h && rgb.sameElements(want) } => ()
        case other =>
          println(s"FAIL trial=$trial w=$w h=$h nf=$nf " +
            s"decoded=${other.map(_.length)}")
          other.foreach { back =>
            back.zip(frames).zipWithIndex.foreach {
              case (((dw, dh, rgb), want), f) =>
                if (!(dw == w && dh == h && rgb.sameElements(want))) {
                  println(s"frame $f dims ${dw}x$dh")
                  val bad = rgb.indices.filter(i => rgb(i) != want(i))
                  println(s"  first bad bytes: ${bad.take(8)
                    .map(i => s"$i:${rgb(i) & 0xff}vs${want(i) & 0xff}")
                    .mkString(" ")} of ${rgb.length}")
                }
            }
          }
          // hexdump the stream head
          println(gif.take(64).map(b => f"${b & 0xff}%02x").mkString(" "))
          return
      }
      trial += 1
    }
    // deep-LZW stress: 256-color frames big enough to push the code
    // width up and (at 100x75+) cross the 4096-entry dictionary reset
    var big = 0
    while (big < 20) {
      val w = 60 + rnd.nextInt(80)
      val h = 60 + rnd.nextInt(80)
      val frames = (0 until 2).map { _ =>
        val rgb = new Array[Byte](w * h * 3)
        var p = 0
        while (p < w * h) {
          // exactly 256 possible colors: 16 r-levels x 4 g x 4 b
          rgb(p * 3) = (rnd.nextInt(16) * 17).toByte
          rgb(p * 3 + 1) = (rnd.nextInt(4) * 85).toByte
          rgb(p * 3 + 2) = (rnd.nextInt(4) * 85).toByte
          p += 1
        }
        rgb
      }
      val gif = Multimodal.gifEncodeFrames(w, h, frames)
      val ok = Multimodal.gifDecodeFrames(gif) match {
        case Some(back) => back.length == 2 &&
          back.zip(frames).forall { case ((dw, dh, rgb), want) =>
            dw == w && dh == h && rgb.sameElements(want) }
        case None => false
      }
      if (!ok) { println(s"FAIL big=$big w=$w h=$h"); return }
      big += 1
    }
    println("all pass")
  }
}
