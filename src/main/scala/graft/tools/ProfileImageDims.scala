package graft.tools

import graft.operators.Multimodal.ImageHeader

/** Where does mm_image_dims' ~1 s for 500 rows go — the header parse
  * (suspicious if so: a marker walk over ~100 bytes) or the in-query
  * fixture synthesis (PNG deflate + JDK JPEG encode per row)?
  * Driver-side microbenchmark, no Spark.
  *
  * Usage: runMain graft.tools.ProfileImageDims [rows]
  */
object ProfileImageDims {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    def pass(): (Double, Double) = {
      val payloads = new Array[Array[Byte]](n)
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) {
        val id = i.toLong
        val w = 8 + (id * 7 % 64).toInt
        val h = 8 + (id * 13 % 64).toInt
        def pix(x: Int, y: Int) = ((id * 31 + x * 7 + y * 13) % 251).toInt
        payloads(i) =
          if (id % 2 == 0) ImageHeader.encodePngStored(w, h, pix)
          else ImageHeader.encodeJpeg(w, h, pix)
        i += 1
      }
      val tEnc = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      var acc = 0L
      i = 0
      while (i < n) {
        val (w, h) = ImageHeader.dims(payloads(i)).get
        acc += w + h
        i += 1
      }
      val tDec = (System.nanoTime() - t1) / 1e9
      require(acc > 0)
      (tEnc, tDec)
    }
    pass() // warmup (JIT + ImageIO plugin discovery)
    val (e, d) = pass()
    println(f"rows=$n  encode=${e}%.3fs (${e / n * 1e3}%.3f ms/row)  " +
      f"parse=${d}%.3fs (${d / n * 1e6}%.3f us/row)")
  }
}
