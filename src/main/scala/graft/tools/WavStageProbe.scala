package graft.tools

/** Dev diagnostic: per-stage codec costs (fixture encode vs decode,
  * WAV vs PNG) at one SF — the probe that isolated the javax.sound
  * provider-scan contention fixed in `MediaCodec.audioReaders`.
  * `WavStageProbe [sfDir]`, default sf0.1. */
object WavStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    import graft.multimodal.Multimodal
    // warm
    Multimodal.wavFromDocuments(spark, d).count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s ($n rows)")
    }
    time("ids only")(graft.core.Tables.documents(spark, d).select("doc_id").count())
    time("wav encode")(Multimodal.wavFromDocuments(spark, d).count())
    time("wav encode (2nd)")(Multimodal.wavFromDocuments(spark, d).count())
    time("encode+decode")(Multimodal.decodeAudioStats(Multimodal.wavFromDocuments(spark, d)).count())
    time("png encode")(Multimodal.pngFromDocuments(spark, d).count())
    time("png encode+decode")(Multimodal.decodeImageStats(Multimodal.pngFromDocuments(spark, d)).count())
    spark.stop()
  }
}
