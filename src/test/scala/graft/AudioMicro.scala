package graft

/** Single-threaded microbench of the WAV encode/decode path:
  * `sbt "Test/runMain graft.AudioMicro"`. Separates AudioSystem.write,
  * getAudioInputStream, and the PCM read loop to locate the per-row cost
  * seen in the 50x smoke. */
object AudioMicro {
  def main(args: Array[String]): Unit = {
    val n = 2000
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e3 / n}%8.1f us/op")
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](4500 * 2)
    // warm
    (1 to 200).foreach { _ =>
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 4500L)
      val buf = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    }
    var wav: Array[Byte] = null
    time("encode (AudioSystem.write)") {
      (1 to n).foreach { _ =>
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, 4500L)
        val buf = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
        wav = buf.toByteArray
      }
    }
    time("getAudioInputStream") {
      (1 to n).foreach { _ =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(wav))
        in.close()
      }
    }
    time("decode full (stream+read)") {
      (1 to n).foreach { _ =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(wav))
        val data = in.readAllBytes()
        var s = 0L; var i = 0
        while (i < data.length / 2) { s += data(i * 2); i += 1 }
        in.close()
      }
    }
  }
}
