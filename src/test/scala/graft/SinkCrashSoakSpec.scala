package graft

import org.apache.spark.sql.functions.col

/** The corpus sink's maintenance protocol, soaked under a seeded
  * randomized schedule — the streaming twin of [[CompositionSoakSpec]].
  * Every crash window is spec'd alone in StreamingSpec (lost marker,
  * lost fp partition, lost data partition, orphan consolidated
  * partition, pending manifest, torn manifest, stray dir); this spec
  * is their COMPOSITIONS: a seeded interleaving of micro-batches
  * (with duplicate content), kill-point replays, graced and immediate
  * maintenance passes, marker compaction, and store-corruption
  * injections, with exactness asserted mid-run and at the end.
  *
  * Determinism: every choice comes from ONE `scala.util.Random(seed)`,
  * and the sink's own async maintenance cadence is disabled for the
  * run (`graft.sink.maintainEvery=0`) with maintenance driven from the
  * schedule instead — any failure reproduces from the seed alone.
  *
  * Kill-points mirror the sink's real write order (data -> fp ->
  * marker): a simulated crash deletes a SUFFIX of that order for the
  * batch JUST applied and immediately replays the same (batchId, data)
  * — the only replay Structured Streaming's at-least-once contract can
  * produce. Replays are injected BEFORE any later maintenance can fold
  * the batch's marker into the watermark, exactly like a real crash
  * (a marker that never landed can never have advanced the hwm).
  *
  * Invariants, asserted against a driver-side model of the admission
  * contract (first doc per content fingerprint wins; within a batch,
  * the lowest doc_id):
  *   - stored doc_ids == the model's winners (no loss, no duplicate
  *     admission) — checked mid-run and at the end;
  *   - after offline convergence passes, the fp store holds EXACTLY
  *     one key per admitted doc, in one conforming generation, and
  *     the pass loop terminates (no rewrite oscillation);
  *   - a final probe still vetoes every stored text and admits novel
  *     content.
  */
class SinkCrashSoakSpec extends SparkSpec {

  private val words = Vector("alpha", "bravo", "cedar", "delta", "ember",
    "fjord", "grove", "heron", "inlet", "joule", "karst", "lumen",
    "maple", "noble", "ombre", "pine", "quartz", "river", "stone",
    "tundra", "umber", "vale", "willow", "zephyr")

  private def soak(seed: Long, steps: Int): Unit = {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(seed)
    val dir = tmpDir(s"sink-soak-$seed")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val sink = graft.streaming.DocStreams.corpusBatchSink(dir)
    def prep(rows: Seq[(Long, String)]) =
      graft.streaming.DocStreams.qualityFilter(
          rows.map { case (id, t) =>
            (id, t, new java.sql.Timestamp(id * 60000L)) }
            .toDF("doc_id", "text", "ts"))
        .withColumn("fp",
          graft.pipeline.TextAnalysis.fingerprintExpr(col("text")))

    // driver-side model of the admission contract
    val admitted = scala.collection.mutable.Map.empty[String, Long]
    val textPool = scala.collection.mutable.ArrayBuffer.empty[String]
    var nextDoc = 0L
    var nextBatch = 0L
    var tornId = -100000L - seed * 1000L

    def freshText(): String =
      Seq.fill(6 + rnd.nextInt(5))(words(rnd.nextInt(words.size)))
        .mkString(" ")

    def storedIds(): Set[Long] =
      if (!fs.exists(p(s"$dir/data"))) Set.empty
      else spark.read.parquet(s"$dir/data")
        .select("doc_id").collect().map(_.getLong(0)).toSet

    def checkExact(where: String): Unit = {
      val got = storedIds()
      assert(got == admitted.values.toSet,
        s"seed=$seed $where: stored ${got.size} docs, model has " +
          s"${admitted.size}; extra=${(got -- admitted.values).take(5)} " +
          s"missing=${(admitted.values.toSet -- got).take(5)}")
    }

    def runBatch(): Unit = {
      val b = nextBatch; nextBatch += 1
      val docs = (0 until 1 + rnd.nextInt(4)).map { _ =>
        val id = nextDoc; nextDoc += 1
        val t =
          if (textPool.nonEmpty && rnd.nextDouble() < 0.4)
            textPool(rnd.nextInt(textPool.size)) // duplicate content
          else freshText()
        id -> t
      }
      docs.foreach { case (_, t) => textPool += t }
      def apply(): Unit = sink(prep(docs), b)
      apply()
      docs.groupBy(_._2).foreach { case (t, ds) =>
        if (!admitted.contains(t)) admitted(t) = ds.map(_._1).min
      }
      // kill-point roulette on the batch just applied: delete a suffix
      // of the sink's write order, then the at-least-once replay
      rnd.nextInt(4) match {
        case 0 => // marker lost after both writes
          fs.delete(p(s"$dir/_applied_$b"), false)
          apply()
        case 1 => // crash between data write and fp write
          fs.delete(p(s"$dir/_applied_$b"), false)
          fs.delete(p(s"$dir/fp/batch_id=$b"), true)
          apply()
        case 2 => // crash before anything landed
          fs.delete(p(s"$dir/_applied_$b"), false)
          fs.delete(p(s"$dir/fp/batch_id=$b"), true)
          fs.delete(p(s"$dir/data/batch_id=$b"), true)
          apply()
        case _ => // clean commit; sometimes a marker-intact replay no-op
          if (rnd.nextBoolean()) apply()
      }
    }

    def maintenance(): Unit = rnd.nextInt(3) match {
      case 0 => // immediate pass (offline-style): manifests applied now
        graft.streaming.DocStreams.compactMarkers(spark, dir)
        graft.streaming.DocStreams.compactFpStore(spark, dir)
      case 1 => // graced pass: the pending-manifest window stays open...
        graft.streaming.DocStreams.compactFpStore(spark, dir,
          graceMs = 3600000L)
        // ...and sometimes the fold "crashes" before its manifest
        // survives — the orphan-consolidated-partition window
        if (rnd.nextBoolean()) {
          val ms = fs.listStatus(p(s"$dir/fp"))
            .filter(_.getPath.getName.startsWith("_folded_"))
          if (ms.nonEmpty)
            fs.delete(ms(rnd.nextInt(ms.length)).getPath, false)
        }
      case _ => // marker fold alone (hwm advance between fp passes)
        graft.streaming.DocStreams.compactMarkers(spark, dir)
    }

    def corrupt(): Unit = rnd.nextInt(3) match {
      case 0 => // torn manifest claiming a LIVE partition (no terminator)
        val parts = fs.listStatus(p(s"$dir/fp")).map(_.getPath.getName)
          .filter(n => n.startsWith("batch_id=") &&
            n.stripPrefix("batch_id=").toLongOption.isDefined)
        if (parts.nonEmpty) {
          val claim = parts(rnd.nextInt(parts.length))
            .stripPrefix("batch_id=")
          val out = fs.create(p(s"$dir/fp/_folded_$tornId"), true)
          tornId -= 1L
          out.write(s"$claim\n"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          out.close()
        }
      case 1 => // stray non-conforming dir (editor backup)
        fs.mkdirs(p(s"$dir/fp/batch_id=junk.bak"))
      case _ => // sidecar lost (crash between partition data and _ranges)
        val parts = fs.listStatus(p(s"$dir/fp")).filter(st =>
          st.isDirectory && st.getPath.getName.startsWith("batch_id=") &&
            st.getPath.getName.stripPrefix("batch_id=")
              .toLongOption.isDefined)
        if (parts.nonEmpty)
          fs.delete(new org.apache.hadoop.fs.Path(
            parts(rnd.nextInt(parts.length)).getPath, "_ranges"), false)
    }

    spark.conf.set("graft.sink.maintainEvery", "0")
    try {
      runBatch() // seed the store so every injection site exists
      (1 until steps).foreach { step =>
        rnd.nextInt(10) match {
          case 0 | 1 | 2 | 3 | 4 | 5 => runBatch()
          case 6 | 7 => maintenance()
          case 8 => corrupt()
          case _ => checkExact(s"step $step")
        }
      }
      checkExact("end of schedule")

      // offline convergence: repeated default passes must terminate
      // and reach ONE conforming generation (stray dirs aside)
      var passes = 0
      while (graft.streaming.DocStreams.compactFpStore(spark, dir) > 0L
          && passes < 40) passes += 1
      assert(passes < 40, s"seed=$seed: offline passes did not converge")
      val gens = fs.listStatus(p(s"$dir/fp")).filter(st =>
        st.isDirectory && st.getPath.getName.stripPrefix("batch_id=")
          .toLongOption.isDefined)
      assert(gens.length == 1,
        s"seed=$seed: ${gens.map(_.getPath.getName).toSeq} after converge")
      val fps = spark.read.parquet(s"$dir/fp")
        .select(org.apache.spark.sql.functions.hex(col("fpb")))
        .collect().map(_.getString(0)).toSeq
      assert(fps.size == fps.distinct.size,
        s"seed=$seed: duplicate fp keys survived convergence")
      assert(fps.size == admitted.size,
        s"seed=$seed: fp store has ${fps.size} keys, model ${admitted.size}")
      checkExact("after convergence")

      // final probe over the converged store: stored content vetoed,
      // novel content admitted
      val known = textPool(rnd.nextInt(textPool.size))
      val novel = "entirely novel closing document for seed " +
        s"${words(seed.toInt % words.size)} ${words((seed.toInt * 7) % words.size)}"
      val (idK, idN) = (nextDoc, nextDoc + 1)
      sink(prep(Seq(idK -> known, idN -> novel)), nextBatch)
      val got = storedIds()
      assert(!got.contains(idK), s"seed=$seed: stored text re-admitted")
      assert(got.contains(idN), s"seed=$seed: novel text not admitted")
    } finally spark.conf.unset("graft.sink.maintainEvery")
  }

  // GRAFT_SOAK_STEPS lengthens the schedule for ad-hoc torture runs
  // (e.g. 600-step) without changing the committed suite's cost
  private val steps =
    sys.env.get("GRAFT_SOAK_STEPS").flatMap(_.toIntOption).getOrElse(200)

  for (seed <- Seq(11L, 23L, 37L, 41L))
    test(s"sink maintenance crash soak, seed $seed ($steps steps)") {
      soak(seed, steps)
    }
}
