package graft

/** Warm-vs-cold probe for the audio near-dup path:
  * `sbt "Test/runMain graft.AudioProbe [sfDir]"`. Pass 1 pays codegen +
  * JIT + the signature checkpoint build; passes 2-3 are the steady state
  * the bench's warm median reports. Used to validate the round-9
  * redesign (64-window synthesis + checkpointed signature frame).
  */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.getOrCreate("audio-probe")
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach { pass =>
      val t0 = System.nanoTime()
      val n = queries.LlmOps.qAudioNearDup(spark, dir).count()
      val tf = System.nanoTime()
      val f = queries.LlmOps.qAudioFingerprint(spark, dir).count()
      println(f"pass $pass: neardup ${(tf - t0) / 1e9}%6.2fs rows=$n | " +
        f"fingerprint ${(System.nanoTime() - tf) / 1e9}%6.2fs rows=$f")
    }
    spark.stop()
  }
}
