package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

/** ANN model-CAPACITY sweep (round-15 verdict lead ask): s20's served
  * recall@5 falls 0.532 → 0.380 from sf0.01 to sf0.1 because the
  * corpus grew 4× while the model stayed at cells=8, m=8, k=8 —
  * quantization granularity per point fell. This probe prices the
  * capacity axes AT a given corpus so the serving defaults can SCALE
  * with N instead of being constants:
  *
  *  - `cells` (coarse quantizer size): more cells = shorter inverted
  *    lists and finer residuals, but at fixed nprobe a larger cell
  *    count probes a smaller corpus FRACTION, so the IVF ceiling can
  *    fall — cells and nprobe must move together.
  *  - `k` (PQ codes per subspace): more codes = finer residual
  *    quantization = less coding loss, at 2× ADC-table cost and one
  *    extra bit per code.
  *  - `nprobe`: the recall/read-cost knob; the ceiling cells alone
  *    allow (exact ranking within the probed cells) is measured next
  *    to every PQ point so coding loss and probe loss stay separable.
  *
  * Lifecycle per point mirrors s20 exactly (train coarse on arrival
  * slice 0, freeze; train the PQ codebook on batch-0 residuals at
  * iters=5, freeze; publish; serve at shortlist=100) so a swept
  * operating point transfers to the s20/s21 gate unchanged.
  *
  * Prints one JSON line:
  *   {"metric":"capacity_sweep","n":N,"sf":"sfX",
  *    "rule":{"cells":c,"nprobe":p},
  *    "ivf_ceiling":[{"cells":c,"nprobe":p,"recall":r},...],
  *    "pq":[{"cells":c,"k":k,"nprobe":p,"recall":r,"serve_sec":s},...]}
  * Usage: runMain graft.tools.CapacityProbe [sfDir] [replicate]
  *
  * `replicate = R > 1` scales the corpus R× with PERTURBED copies
  * (id-shifted, each component nudged by a deterministic per-(copy,
  * id, position) hash — exact clones would make ANN degenerate: a
  * query's true top-5 would be its own zero-distance clones) and
  * restricts the grid to the RULE's point plus the fixed legacy point
  * — the cell that shows the rule RE-DERIVING an appropriate model at
  * a corpus the fixed configuration was never sized for. */
object CapacityProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    // `natural` mode (round-17 verdict #4): the replicate cells pin the
    // rule on hash-perturbed COPIES — an artificially clusterable
    // corpus. The fixture tree has no natural 10x embeddings (sf0.1 is
    // the largest, 2000 vectors), so the largest NATURAL corpus
    // constructible is the sf0.1 DOCUMENTS table (5000 distinct real
    // documents, 2.5x) rendered as deterministic 64-dim feature-hash
    // vectors — their cluster structure is the text corpus's own, not
    // perturbation's. The cell compares the rule's point against the
    // legacy-sized model at the SAME probed fraction; whatever it
    // shows is the finding.
    val natural = args.lift(1).contains("natural")
    // `seeds` mode (round-17): quantify the SEED-SENSITIVITY band the
    // s22 gate doc cites — the same capacity point (the rule's cells,
    // nprobe, on this corpus) trained from different md5 salt streams
    // and from different training prefixes (arrival slice 0 — s21's
    // shape — vs the committed 3/4 prefix a mid-run migration trains
    // on — s22's shape). Measured as the IVF CEILING (exact ranking
    // within the probed cells), which isolates quantizer quality from
    // PQ coding loss. If the slice-0 vs prefix spread sits inside the
    // cross-salt spread, the s21-vs-s22 recall gap is seed noise, not
    // a training-set effect.
    val seeds = args.lift(1).contains("seeds")
    // `drift` mode (round-18 verdict #5): s22 grows by MODULAR slices
    // of one corpus, so the capacity migration's prefix-retrained
    // model has seen the distribution it serves. This cell makes the
    // post-crossing slice GENUINELY different data: the natural
    // document vectors arrive ordered by (lang, n_chars) — a real
    // attribute order, so the last quartile is a different language/
    // length mix than the prefix — and the cell compares the
    // prefix-retrained model's IVF ceiling ON THE NEW SLICE's queries
    // against a full retrain at the same (cells, nprobe). The ceiling
    // isolates quantizer quality from PQ coding loss (the seeds-mode
    // precedent). Whatever the delta shows is the finding: if drift
    // erodes the prefix-retrain margin, that prices the re-fire
    // cadence a drifting deployment needs.
    val drift = args.lift(1).contains("drift")
    val replicate =
      if (natural || seeds || drift) 1
      else args.lift(1).map(_.toInt).getOrElse(1)
    val base = java.nio.file.Files.createTempDirectory("graft_capacity")

    if (drift) {
      val docs = graft.core.Tables.documents(spark, src)
        .select(col("doc_id").as("vec_id"), col("text"), col("lang"),
          col("n_chars"))
      val feats = docs
        .select(col("vec_id"),
          explode(split(lower(col("text")), "\\s+")).as("t"))
        .filter(length(col("t")) > 0)
        .select(col("vec_id"),
          pmod(xxhash64(col("t")), lit(64)).cast("int").as("p"),
          when(pmod(xxhash64(col("t"), lit(1L)), lit(2)) === 0, 1.0)
            .otherwise(-1.0).as("s"))
        .groupBy("vec_id", "p").agg(sum("s").as("v"))
        .groupBy("vec_id")
        .agg(map_from_entries(collect_list(struct(col("p"), col("v"))))
          .as("m"))
        .select(col("vec_id"),
          transform(sequence(lit(0), lit(63)), i =>
            (coalesce(element_at(col("m"), i.cast("int")), lit(0.0))
              / 50.0).cast("float")).as("embedding"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("lang"), col("n_chars"), col("vec_id"))
      val total = docs.count()
      val withQ = feats.join(
        docs.select(col("vec_id"), col("lang"), col("n_chars"))
          .withColumn("rk", row_number().over(w))
          .select(col("vec_id"),
            (((col("rk") - 1) * 4) / total).cast("int").as("quartile")),
        "vec_id").cache()
      val all = withQ.select("vec_id", "embedding").cache()
      val nAll = all.count()
      val ruleD = graft.similarity.Ann.ivfCapacityForCorpus(nAll)
      val prefix = withQ.filter(col("quartile") <= 2)
        .select("vec_id", "embedding")
      def qzL(df: org.apache.spark.sql.DataFrame) = df.select(col("vec_id"),
        transform(col("embedding").cast(ArrayType(DoubleType)),
          x => floor(x * 1000000d).cast(LongType)).as("q"))
      def exactOf(qs: org.apache.spark.sql.DataFrame) =
        graft.similarity.Ann.integerTopK(
          qzL(all).withColumn("k0", lit(0)),
          qzL(qs).select(col("vec_id").as("query_id"), col("q").as("qv"))
            .withColumn("k0", lit(0)),
          "vec_id", "k0", 5)
          .select("query_id", "neighbor_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val qNew = withQ.filter(col("quartile") === 3)
        .orderBy("vec_id").limit(50).select("vec_id", "embedding").cache()
      val qOld = withQ.filter(col("quartile") === 0)
        .orderBy("vec_id").limit(50).select("vec_id", "embedding").cache()
      val exNew = exactOf(qNew); val exOld = exactOf(qOld)
      val cells = for (
        (ttag, train) <- Seq("prefix_retrain" -> prefix,
          "full_retrain" -> all);
        (qtag, qs, ex) <- Seq(("new_slice", qNew, exNew),
          ("prefix", qOld, exOld))
      ) yield {
        val cents = graft.similarity.Ann.portableKmeansCentroids(train,
          "vec_id", "embedding", dim = 64, k = ruleD.cells, iters = 2)
        val idxDf = graft.similarity.Ann.portableAssignWithCentroids(
          all, "vec_id", "embedding", cents)
        val qdf = graft.similarity.Ann.portableQueryCells(qs, "vec_id",
          "embedding", cents, ruleD.nprobe)
        val got = graft.similarity.Ann.integerTopK(idxDf, qdf,
          "vec_id", "cell", 5)
          .select(col("query_id").cast("long"),
            col("neighbor_id").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val r = ex.intersect(got).size.toDouble / ex.size
        // no clearCache here: withQ/all/qNew/qOld are cached ONCE above
        // and every remaining cell reads them — a global clear would
        // recompute the whole feature build per cell (r18 review); the
        // per-cell kmeans/assign frames are never cached
        println(f"[capacity] drift train=$ttag%-14s queries=$qtag%-9s " +
          f"ivf_ceiling $r%.3f")
        (ttag, qtag, r)
      }
      val sfNameD = new java.io.File(src).getName
      println(s"""{"metric":"capacity_sweep","n":$nAll,"sf":"$sfNameD",""" +
        s""""mode":"drift","order":"lang,n_chars",""" +
        s""""rule":{"cells":${ruleD.cells},"nprobe":${ruleD.nprobe}},""" +
        s""""drift":""" + cells.map { case (t, q, r) =>
          f"""{"train":"$t","queries":"$q","ivf_ceiling":$r%.3f}"""
        }.mkString("[", ",", "]") + "}")
      spark.stop()
      graft.core.TempDirs.deleteRecursively(base.toFile)
      return
    }

    val vecsBase =
      if (!natural) graft.core.Tables.embeddings(spark, src)
        .select("vec_id", "embedding")
      else {
        val docs = graft.core.Tables.documents(spark, src)
          .select(col("doc_id").as("vec_id"), col("text"))
        docs
          .select(col("vec_id"),
            explode(split(lower(col("text")), "\\s+")).as("t"))
          .filter(length(col("t")) > 0)
          .select(col("vec_id"),
            pmod(xxhash64(col("t")), lit(64)).cast("int").as("p"),
            when(pmod(xxhash64(col("t"), lit(1L)), lit(2)) === 0, 1.0)
              .otherwise(-1.0).as("s"))
          .groupBy("vec_id", "p").agg(sum("s").as("v"))
          .groupBy("vec_id")
          .agg(map_from_entries(collect_list(struct(col("p"), col("v"))))
            .as("m"))
          .select(col("vec_id"),
            transform(sequence(lit(0), lit(63)), i =>
              (coalesce(element_at(col("m"), i.cast("int")), lit(0.0))
                / 50.0).cast("float")).as("embedding"))
      }
    val vecs =
      if (replicate <= 1) vecsBase
      else (0 until replicate).map { c =>
        if (c == 0) vecsBase
        else vecsBase.select(
          (col("vec_id") + lit(c * 10000000000L)).as("vec_id"),
          // ±0.2 per component — comparable to inter-vector spacing,
          // so a copy is a NEW point in the original's neighborhood,
          // not a zero-distance clone the serve finds for free
          // (measured: ±0.001 noise saturates every config at recall
          // 1.000 — clones follow their query into its cell)
          transform(col("embedding"),
            (x, i) => x + (pmod(xxhash64(col("vec_id"), i, lit(c)),
              lit(400000L)).cast("double") - 200000d) / 1000000d)
            .as("embedding"))
      }.reduce(_ unionByName _)
    val n = vecs.count()
    val qn = 50
    val queries = vecs.filter(col("vec_id") < qn)

    def qz(df: org.apache.spark.sql.DataFrame) = df.select(col("vec_id"),
      transform(col("embedding").cast(ArrayType(DoubleType)),
        x => floor(x * 1000000d).cast(LongType)).as("q"))
    val exact = graft.similarity.Ann.integerTopK(
      qz(vecs).withColumn("k0", lit(0)),
      qz(queries).select(col("vec_id").as("query_id"), col("q").as("qv"))
        .withColumn("k0", lit(0)),
      "vec_id", "k0", 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("query_id").cast("long"),
          col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }

    val rule = graft.similarity.Ann.ivfCapacityForCorpus(n)
    println(s"[capacity] n=$n rule: cells=${rule.cells} nprobe=${rule.nprobe}")

    if (seeds) {
      val cellsSens = for (
        salt <- Seq("pkmeans", "pkseed2", "pkseed3");
        (tag, train) <- Seq(
          "slice0" -> vecs.filter(pmod(col("vec_id"), lit(4)) === 0),
          "prefix3" -> vecs.filter(pmod(col("vec_id"), lit(4)) <= 2))
      ) yield {
        val cents = graft.similarity.Ann.portableKmeansCentroids(train,
          "vec_id", "embedding", dim = 64, k = rule.cells, iters = 2, salt)
        val idxDf = graft.similarity.Ann.portableAssignWithCentroids(
          vecs, "vec_id", "embedding", cents)
        val qdf = graft.similarity.Ann.portableQueryCells(queries,
          "vec_id", "embedding", cents, rule.nprobe)
        val r = recallOf(graft.similarity.Ann.integerTopK(idxDf, qdf,
          "vec_id", "cell", 5))
        spark.catalog.clearCache()
        println(f"[capacity] seeds salt=$salt%-8s train=$tag%-7s " +
          f"ivf_ceiling $r%.3f")
        (salt, tag, r)
      }
      val sfName0 = new java.io.File(src).getName
      println(s"""{"metric":"capacity_sweep","n":$n,"sf":"$sfName0",""" +
        s""""mode":"seeds","rule":{"cells":${rule.cells},""" +
        s""""nprobe":${rule.nprobe}},"seed_sensitivity":""" +
        cellsSens.map { case (s, t, r) =>
          f"""{"salt":"$s","train":"$t","ivf_ceiling":$r%.3f}"""
        }.mkString("[", ",", "]") + "}")
      spark.stop()
      graft.core.TempDirs.deleteRecursively(base.toFile)
      return
    }

    // full grid on the native corpus; rule point vs fixed legacy point
    // on a replicated or natural one (the grid would re-measure what
    // the native sweep already priced, at many times the wall)
    val gridRun = replicate <= 1 && !natural
    val cellsAxis =
      if (gridRun) Seq(8, 16, 32) else Seq(8, rule.cells).distinct
    val kAxis = if (gridRun) Seq(8, 16) else Seq(16)
    val npAxis =
      if (gridRun) Seq(2, 4, 8) else Seq(2, rule.nprobe).distinct

    val results = cellsAxis.map { cells =>
      // the s13/s20 arrival shape: 4 slices, slice 0 trains + freezes
      val idx = base.resolve(s"idx_c$cells").toString
      val cen = base.resolve(s"cen_c$cells").toString
      (0 until 4).foreach { i =>
        graft.streaming.AnnStream.processIvfBatch(
          vecs.filter(pmod(col("vec_id"), lit(4)) === i), i.toLong,
          idx, cen, "vec_id", "embedding", dim = 64, cells = cells,
          iters = 2)
      }
      spark.catalog.clearCache()
      val ceilings = npAxis.map { np =>
        val r = recallOf(graft.streaming.AnnStream.ivfServeTopK(spark, idx,
          cen, queries, "vec_id", "embedding", topK = 5, nprobe = np))
        spark.catalog.clearCache()
        println(f"[capacity] cells=$cells%2d nprobe=$np  ivf_ceiling $r%.3f")
        (np, r)
      }
      val pq = kAxis.flatMap { k =>
        val cb = graft.streaming.AnnStream.trainPqCodebook(spark, idx, cen,
          m = 8, k = k, iters = 5)
        val coded = base.resolve(s"coded_c${cells}_k$k").toString
        graft.streaming.AnnStream.publishPqIndex(spark, idx, cen, coded,
          "vec_id", m = 8, k = k, cb)
        npAxis.map { np =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val r = recallOf(graft.streaming.AnnStream.pqServeTopK(spark,
            coded, cen, vectors = vecs, queries = queries, "vec_id",
            "embedding", m = 8, k = k, nprobe = np, shortlist = 100,
            topK = 5, cb))
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"[capacity] cells=$cells%2d k=$k%2d nprobe=$np  " +
            f"recall@5 $r%.3f  serve $dt%5.2f s")
          (k, np, r, dt)
        }
      }
      (cells, ceilings, pq)
    }

    // RECALL-TARGET cell (round-16 verdict #3, gates Ann.nprobeForRecall
    // at a NON-default target): the API's point for "recall >= 0.55" is
    // the 1/2-fraction entry of the committed curve — serve it through
    // the same gated lifecycle and record whether the target was met.
    val targetCell = if (!gridRun) "" else {
      val target = 0.55
      val api = graft.similarity.Ann.nprobeForRecall(n, target).get
      val idx = base.resolve(s"idx_c${api.cells}").toString
      val cen = base.resolve(s"cen_c${api.cells}").toString
      val cb = graft.streaming.AnnStream.trainPqCodebook(spark, idx, cen,
        m = 8, k = 16, iters = 5)
      val coded = base.resolve(s"coded_target").toString
      graft.streaming.AnnStream.publishPqIndex(spark, idx, cen, coded,
        "vec_id", m = 8, k = 16, cb)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = recallOf(graft.streaming.AnnStream.pqServeTopK(spark,
        coded, cen, vectors = vecs, queries = queries, "vec_id",
        "embedding", m = 8, k = 16, nprobe = api.nprobe, shortlist = 100,
        topK = 5, cb))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[capacity] recall_target $target%.2f -> cells=${api.cells} " +
        f"nprobe=${api.nprobe}  recall $r%.3f  serve $dt%5.2f s")
      f""","recall_target":{"target":$target%.2f,"cells":${api.cells},""" +
        f""""nprobe":${api.nprobe},"recall":$r%.3f,""" +
        f""""met":${r >= target},"serve_sec":$dt%.2f}"""
    }

    val sfName = new java.io.File(src).getName
    val ceilJson = results.flatMap { case (c, ceils, _) =>
      ceils.map { case (np, r) =>
        f"""{"cells":$c,"nprobe":$np,"recall":$r%.3f}"""
      }
    }.mkString("[", ",", "]")
    val pqJson = results.flatMap { case (c, _, pq) =>
      pq.map { case (k, np, r, dt) =>
        f"""{"cells":$c,"k":$k,"nprobe":$np,"recall":$r%.3f,"serve_sec":$dt%.2f}"""
      }
    }.mkString("[", ",", "]")
    val mode = if (natural) "natural" else "embeddings"
    println(s"""{"metric":"capacity_sweep","n":$n,"sf":"$sfName",""" +
      s""""replicate":$replicate,"mode":"$mode",""" +
      s""""rule":{"cells":${rule.cells},"nprobe":${rule.nprobe}},""" +
      s""""ivf_ceiling":$ceilJson,"pq":$pqJson$targetCell}""")
    spark.stop()
    graft.core.TempDirs.deleteRecursively(base.toFile)
  }
}
