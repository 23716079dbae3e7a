package graft.tools

import org.apache.spark.sql.types._

/** Environment doctor: diagnose an SF dir for the drift class that
  * cost round 7 its correctness gate (testdata regenerated with a
  * different parquet encoding under a frozen tree). Prints, per
  * table: raw schema → normalized schema, row count, and the
  * min/max of every timestamp column — in seconds, before any query
  * runs. Run this FIRST when correctness rows change without a code
  * change.
  *
  *   sbt "runMain graft.tools.Doctor /root/testdata/sf0.01"
  */
object Doctor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.core.Tables

    var warnings = 0
    def warn(msg: String): Unit = { warnings += 1; println(s"[doctor] WARN $msg") }

    Tables.names.foreach { t =>
      val path = s"$sfDir/$t.parquet"
      if (!new java.io.File(path).exists()) warn(s"$t: $path MISSING")
      else {
        val raw = spark.read.parquet(path)
        // the same dispatch registerAll uses — a table normalized there
        // is, by construction, normalized here
        val loaded = Tables.loaderFor(t)(spark, sfDir)
        val n = loaded.count()
        val drifts = raw.schema.fields.zip(loaded.schema.fields).collect {
          case (a, b) if a.dataType != b.dataType =>
            s"${a.name}: ${a.dataType.simpleString} -> ${b.dataType.simpleString}"
        }
        val driftNote = if (drifts.isEmpty) "" else drifts.mkString("  [normalized: ", "; ", "]")
        println(f"[doctor] $t%-11s rows=$n%-8d ${loaded.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}$driftNote")
        if (n == 0) warn(s"$t: zero rows")
        // any timestamp column must land in a sane range once loaded —
        // the round-7 failure put every event in January 1970
        loaded.schema.fields.filter(_.dataType == TimestampType).foreach { f =>
          val r = loaded.selectExpr(s"min(year(`${f.name}`))", s"max(year(`${f.name}`))").head()
          if (!r.isNullAt(0)) {
            val (lo, hi) = (r.getInt(0), r.getInt(1))
            if (lo < 1990 || hi > 2100)
              warn(f"$t.${f.name}: year range [$lo, $hi] — unit/encoding suspect")
            else
              println(f"[doctor] $t%-11s   ${f.name}: years [$lo, $hi] OK")
          }
        }
        // remaining NTZ after normalization means a query calling
        // unix_micros/cast-to-bigint on it will throw
        loaded.schema.fields.filter(_.dataType == TimestampNTZType).foreach { f =>
          warn(s"$t.${f.name}: still TIMESTAMP_NTZ after load — NTZ-illegal functions will throw")
        }
        if (t == "embeddings") {
          loaded.schema("embedding").dataType match {
            case ArrayType(FloatType, _) =>
              val d = loaded.selectExpr("min(size(embedding))", "max(size(embedding))").head()
              if (d.isNullAt(0)) () // zero rows: already warned above
              else if (d.getInt(0) != d.getInt(1))
                warn(s"embeddings: ragged dims [${d.getInt(0)}, ${d.getInt(1)}]")
              else println(s"[doctor] embeddings   dim=${d.getInt(0)} uniform OK")
            case other => warn(s"embeddings.embedding: $other (expected array<float>)")
          }
        }
      }
    }
    println(if (warnings == 0) "[doctor] HEALTHY — no drift detected"
      else s"[doctor] $warnings WARNING(S) — see above")
    spark.stop()
    if (warnings > 0) sys.exit(1)
  }
}
