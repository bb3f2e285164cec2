package graft

import java.util.concurrent.Executors

/** Single-thread vs multi-thread microbench of the PNG encode/decode
  * path: `sbt "Test/runMain graft.ImageMicro"`. Detects shared-registry
  * contention of the AudioSystem class (graft-jdk-spi-contention) in
  * javax.imageio. */
object ImageMicro {
  def main(args: Array[String]): Unit = {
    javax.imageio.ImageIO.setUseCache(false)
    val n = 20000
    def roundTrip(): Unit = {
      val im = new java.awt.image.BufferedImage(16, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      im.setRGB(3, 3, 0xabcdef)
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", buf)
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(buf.toByteArray))
      assert(back.getWidth == 16)
    }
    (1 to 2000).foreach(_ => roundTrip()) // warm
    var t0 = System.nanoTime()
    (1 to n).foreach(_ => roundTrip())
    val single = (System.nanoTime() - t0) / 1e3 / n
    println(f"single-thread      $single%8.1f us/op")
    for (threads <- Seq(8, 32)) {
      val pool = Executors.newFixedThreadPool(threads)
      t0 = System.nanoTime()
      val futures = (1 to threads).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = (1 to n / threads).foreach(_ => roundTrip())
        })
      }
      futures.foreach(_.get())
      val wall = (System.nanoTime() - t0) / 1e9
      val perOp = wall * 1e6 / n
      println(f"$threads%2d threads         $perOp%8.1f us/op effective " +
        f"(speedup ${single / perOp}%4.1fx)")
      pool.shutdown()
    }
  }
}
