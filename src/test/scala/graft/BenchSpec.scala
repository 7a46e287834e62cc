package graft

import org.apache.spark.sql.SparkSession

/** Pins the bench harness's failure-honest contract: a crashing query
  * must surface in `failed`/`errors`, NEVER as a fast-looking min, and
  * an intermittently-crashing query must be visible as `flaky` with its
  * per-rep success count — not hide behind a legitimate-looking min.
  * Also pins the load-aware contract: per-pass calibration probes ride
  * the artifact and a min measured in a hot-probe window is flagged
  * `load_suspect`, so a judged number measured under background load is
  * visibly untrustworthy without out-of-band re-measurement.
  */
class BenchSpec extends SparkSpec {

  test("a query failing every rep publishes no min and counts as failed") {
    val good = (s: SparkSession, _: String) => s.range(10).toDF("id")
    val bad: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      (_, _) => throw new RuntimeException("boom")
    val results = Bench.measure(spark,
      Seq("zgood" -> good, "abad" -> bad), "unused", reps = 2)
    val line = Bench.render(results, reps = 2, sfDir = "unused")
    // the artifact is one valid JSON object (the driver's parse contract)
    val spark0 = spark
    import spark0.implicits._
    val parsed = spark.read.json(Seq(line).toDS).collect()(0)
    assert(parsed.getAs[Long]("failed") == 1L)
    assert(parsed.getAs[Long]("flaky") == 0L)
    assert(line.contains(""""abad":"RuntimeException: boom""""))
    // reps_ok lists DEVIANTS only: the clean query's count is implied
    assert(line.contains(""""reps_ok":{"abad":0}"""))
    // the judged min map carries only the good query
    val minMap = line.substring(line.lastIndexOf("\"queries\":"))
    assert(!minMap.contains("abad"), minMap)
    assert(minMap.contains("zgood"), minMap)
    // and the failed query contributes nothing to the headline total
    val soloTotal = Bench.render(
      results.filter(_.name == "zgood"), 2, "unused")
    assert(parsed.getAs[Double]("value") ==
      spark.read.json(Seq(soloTotal).toDS).collect()(0).getAs[Double]("value"))
  }

  test("a query crashing on some reps surfaces as flaky with its ok-rep count") {
    var calls = 0
    val flaky = (s: SparkSession, _: String) => {
      calls += 1
      if (calls == 1) throw new IllegalStateException("first rep dies")
      s.range(5).toDF("id")
    }
    val line = Bench.render(
      Bench.measure(spark, Seq("q" -> flaky), "unused", reps = 3),
      reps = 3, sfDir = "unused")
    assert(line.contains(""""failed":0"""))
    assert(line.contains(""""flaky":1"""))
    assert(line.contains(""""reps_ok":{"q":2}"""))
    assert(line.contains("IllegalStateException"))
    // the flaky query's min comes from its 2 successful reps
    assert(line.substring(line.lastIndexOf("\"queries\":")).contains("\"q\":"))
  }

  test("reps are interleaved rep-major so a load spike cannot own one query's whole sample") {
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    def rec(name: String) = (s: SparkSession, _: String) => {
      order += name; s.range(1).toDF("id")
    }
    val results = Bench.measure(spark,
      Seq("b" -> rec("b"), "a" -> rec("a"), "c" -> rec("c")),
      "unused", reps = 3)
    // rep-major: full sorted pass, then the next pass — NOT a,a,a,b,b,b
    assert(order.toSeq == Seq("a", "b", "c", "a", "b", "c", "a", "b", "c"),
      order.mkString(","))
    // every query still gets all its reps and a min
    assert(results.forall(_.okReps == 3))
  }

  test("measure tags every sample with its pass and brackets passes with probes") {
    val good = (s: SparkSession, _: String) => s.range(3).toDF("id")
    val log = new Bench.ProbeLog
    val results = Bench.measure(spark, Seq("q" -> good), "unused",
      reps = 3, log = log)
    // 3 passes -> probes 0,1,2 at pass starts + 1 trailing = 4 probes
    assert(log.times.size == 4)
    assert(results.head.okPasses == Seq(0, 1, 2))
    // pass ids are aligned with ok times, so minPass resolves
    assert(results.head.minPass.exists(p => p >= 0 && p <= 2))
  }

  test("loadSuspects flags exactly the queries whose min came from a hot-probe pass") {
    // probes: pass 0 bracketed by (0.1, 0.1) — clean; pass 1 bracketed by
    // (0.1, 0.9) — hot trailing probe (spike started mid-pass); pass 2
    // bracketed by (0.9, 0.1) — hot leading probe
    val probes = Seq(0.1, 0.1, 0.9, 0.1)
    def q(name: String, times: Seq[Double], passes: Seq[Int]) =
      Bench.QueryResult(name, times, passes, None, 3)
    val results = Seq(
      q("clean", Seq(2.0, 5.0, 5.0), Seq(0, 1, 2)),   // min in pass 0
      q("hot_tail", Seq(5.0, 2.0, 5.0), Seq(0, 1, 2)), // min in pass 1
      q("hot_head", Seq(5.0, 5.0, 2.0), Seq(0, 1, 2)), // min in pass 2
      Bench.QueryResult("dead", Seq.empty, Seq.empty, Some("x"), 3))
    assert(Bench.loadSuspects(results, probes) == Seq("hot_head", "hot_tail"))
    // with all probes equal nothing is suspect
    assert(Bench.loadSuspects(results, Seq(0.1, 0.1, 0.1, 0.1)).isEmpty)
    // and with no probe log at all (legacy render path) nothing is suspect
    assert(Bench.loadSuspects(results, Seq.empty).isEmpty)
  }

  test("render puts the whole judged signal AFTER the min map (tail-safe order)") {
    val r = Seq(Bench.QueryResult("q", Seq(5.0, 1.0), Seq(0, 1), None, 2))
    val probes = Seq(0.1, 0.8, 0.8) // pass 1 (the min's pass) is hot
    val line = Bench.render(r, 2, "unused", probes)
    assert(line.contains(""""probes":[0.1000,0.8000,0.8000]"""), line)
    assert(line.contains(""""load_suspect":["q"]"""), line)
    // probes, suspects, failed/flaky, and the total all sit after the
    // min map: the driver keeps the tail, so the self-qualifying signal
    // must be the last thing truncation could eat
    val qAt = line.lastIndexOf("\"queries\":")
    for (k <- Seq("\"probes\":", "\"load_suspect\":", "\"failed\":",
        "\"flaky\":", "\"total_sec\":"))
      assert(line.lastIndexOf(k) > qAt, s"$k not after min map")
    // a suspect query carries its max (min is untrustworthy there)
    assert(line.contains(""""queries_max":{"q":5.0000}"""), line)
    val spark0 = spark
    import spark0.implicits._
    assert(spark.read.json(Seq(line).toDS).collect()(0)
      .getAs[Double]("value") == 1.0)
  }

  test("a 95-query artifact's judged tail fits a 4 KB capture window") {
    // realistic worst case: 95 queries with driver-length names and
    // full-precision doubles in, nothing flaky/suspect — the r8 failure
    // mode was the LINE outgrowing the driver's ~4 KB tail capture
    val names = (1 to 95).map(i => f"pipeline_operator_name_$i%02d")
    val rng = new scala.util.Random(7)
    val results = names.map(n => Bench.QueryResult(n,
      Seq.fill(3)(0.05 + rng.nextDouble() * 12.345678901234),
      Seq(0, 1, 2), None, 3))
    val probes = Seq.fill(5)(0.05 + rng.nextDouble() * 0.1)
    val line = Bench.render(results, 3, "/root/testdata/sf0.1", probes)
    val tail = line.takeRight(4096)
    // the tail alone carries the min map opener and the full signal
    assert(tail.contains("\"queries\":{"), s"min map head cut: ${tail.take(80)}")
    assert(tail.contains("\"probes\":[") && tail.contains("\"load_suspect\":"))
    assert(tail.contains("\"failed\":0") && tail.contains("\"flaky\":0"))
    assert(tail.contains("\"total_sec\":"))
    // and reconstructs as valid JSON: "{" + tail-from-queries
    val rebuilt = "{" + line.substring(line.lastIndexOf("\"queries\":"))
    val spark0 = spark
    import spark0.implicits._
    val parsed = spark.read.json(Seq(rebuilt).toDS).collect()(0)
    assert(parsed.getAs[Long]("failed") == 0L)
    assert(line.length - line.lastIndexOf("\"queries\":") < 4000,
      s"judged tail too big: ${line.length - line.lastIndexOf("\"queries\":")}")
  }

  test("worst-min re-measure adds a sample to exactly the slowest queries") {
    val good = (s: SparkSession, _: String) => s.range(3).toDF("id")
    val selected = Seq("slow" -> good, "fast" -> good, "mid" -> good)
    val measured = Seq(
      Bench.QueryResult("slow", Seq(9.0, 9.5), Seq(0, 1), None, 2),
      Bench.QueryResult("fast", Seq(0.1, 0.2), Seq(0, 1), None, 2),
      Bench.QueryResult("mid", Seq(1.0, 1.1), Seq(0, 1), None, 2))
    val log = new Bench.ProbeLog
    val defended = Bench.remeasureWorst(spark, selected, measured,
      "unused", n = 2, log = log)
    val byName = defended.map(r => r.name -> r).toMap
    // the two largest mins got one extra (real) sample; the fast one not
    assert(byName("slow").okReps == 3 && byName("mid").okReps == 3)
    assert(byName("fast").okReps == 2)
    // extra samples can only keep or lower the min
    assert(byName("slow").okTimes.min <= 9.0)
    // the defense pass bracketed itself with probes and tagged its samples
    assert(log.times.size == 2)
    assert(byName("slow").okPasses.last == 0)
  }

  test("a failed bonus run adds no sample but records the dropped error as bonus_err") {
    val bad: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      (_, _) => throw new RuntimeException("spike hit the defense pass")
    val measured = Seq(Bench.QueryResult("q", Seq(5.0, 5.1), Seq(0, 1), None, 2))
    val defended = Bench.remeasureWorst(spark, Seq("q" -> bad), measured,
      "unused", n = 1)
    val r = defended.head
    // untouched sample: no time added, still green, min unchanged
    assert(r.okTimes == Seq(5.0, 5.1) && r.firstErr.isEmpty)
    assert(r.bonusErr.exists(_.contains("spike hit the defense pass")))
    val line = Bench.render(defended, 2, "unused")
    assert(line.contains("\"flaky\":0") && line.contains("\"failed\":0"))
    assert(line.contains(""""bonus_err":{"q":"RuntimeException: spike hit the defense pass"}"""))
  }

  test("rerunSuspects gives suspects one extra sample that can clear the flag") {
    val good = (s: SparkSession, _: String) => s.range(3).toDF("id")
    val log = new Bench.ProbeLog
    // seed the log with a hot bracket around pass 0 so "q" is suspect
    // (the recorded probe values are real timings; synthetic ones are
    // exercised via the pure loadSuspects tests above) — here we force
    // suspicion by handing rerunSuspects a result whose min pass is out
    // of probe range with a hot bracket
    log.probe(spark); log.probe(spark)
    // pass 0 hot relative to a later clean probe
    val hotProbes = Seq(10.0, 10.0, 0.1)
    val seeded = Seq(Bench.QueryResult("q", Seq(5.0), Seq(0), None, 1))
    // sanity: with a uniform log nothing reruns (flag computed inside)
    val unchanged = Bench.rerunSuspects(spark, Seq("q" -> good), seeded,
      "unused", log, cooldownSec = 0)
    assert(unchanged == seeded) // both real probes are ~equal -> no suspects
    assert(Bench.loadSuspects(seeded, hotProbes) == Seq("q"))
  }

  test("rerunSuspects ACTUALLY reruns a suspect: extra sample tagged with the new pass") {
    val good = (s: SparkSession, _: String) => s.range(3).toDF("id")
    val log = new Bench.ProbeLog
    // forced-hot pass 0 bracket vs a clean floor — "q" (min pass 0) is suspect
    log.record(10.0); log.record(10.0); log.record(0.1)
    val seeded = Seq(Bench.QueryResult("q", Seq(5.0), Seq(0), None, 1))
    assert(Bench.loadSuspects(seeded, log.times) == Seq("q"))
    val out = Bench.rerunSuspects(spark, Seq("q" -> good), seeded,
      "unused", log, cooldownSec = 0)
    val r = out.head
    // one extra sample, tagged with the probe pass appended by the rerun
    assert(r.okTimes.size == 2 && r.okTimes.head == 5.0)
    assert(r.okPasses == Seq(0, 3), r.okPasses.toString)
    assert(r.bonusErr.isEmpty)
    // the rerun also appended a trailing probe (indices 3 and 4)
    assert(log.times.size == 5)
  }

  test("rerunSuspects records a crashing suspect as bonus_err without a sample") {
    val bad: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      (_, _) => throw new RuntimeException("still under load")
    val log = new Bench.ProbeLog
    log.record(10.0); log.record(10.0); log.record(0.1)
    val seeded = Seq(Bench.QueryResult("q", Seq(5.0), Seq(0), None, 1))
    val out = Bench.rerunSuspects(spark, Seq("q" -> bad), seeded,
      "unused", log, cooldownSec = 0)
    val r = out.head
    assert(r.okTimes == Seq(5.0) && r.okPasses == Seq(0))
    assert(r.bonusErr.exists(_.contains("still under load")))
  }

  test("a failed probe run never becomes the probe floor") {
    // the probe takes min over SUCCESSFUL runs only; with a real session
    // all runs succeed and the recorded value is a plausible job time,
    // not a microsecond-scale failure artifact. The floor is 100µs, NOT
    // 1ms: a fully warm codegen'd 8M-row sum can genuinely dip under
    // 1ms on this box (min of 3 runs — flaked twice at the old bound
    // under full-suite load), while the failure artifact this guards
    // against is tens of microseconds — a decade of margin both ways
    val log = new Bench.ProbeLog
    log.probe(spark)
    assert(log.times.head > 0.0001, log.times.toString)
    // render emits locale-safe dot decimals and a finite sentinel for
    // an all-failed (+inf) probe entry
    log.record(Double.PositiveInfinity)
    val line = Bench.render(
      Seq(Bench.QueryResult("q", Seq(1.0), Seq(0), None, 1)), 1, "sf",
      log.times)
    assert(line.contains("9999.0"), line)
    assert(!line.contains(","+"probes"), line)
    // every entry must be a dot-decimal: a locale-comma leak ("0,0340")
    // splits into dotless tokens. (A substring check on "0," false-
    // positives whenever a legit value ends in 0 before the array
    // separator — flaked exactly that way once under full-suite load.)
    val probesPart = line.split("\"probes\":")(1).split("]")(0)
      .stripPrefix("[")
    val toks = probesPart.split(",")
    assert(toks.nonEmpty && toks.forall(_.matches(raw"\d+\.\d+")),
      s"locale-unsafe probe rendering: $probesPart")
  }

  test("parseBenchArtifact recovers per-query mins from a truncated driver tail") {
    // the committed artifact: a wrapper whose tail starts MID-map (the
    // common case — the min map is bigger than the 2 KB capture) with a
    // name-truncated first value and a queries_max remnant before it
    val wrapper = """{ "n": 18, "rc": 0, "tail": "x\":9.9,\"dedup_minhash\":6.3815,\"dedup_ngram\":2.2177,\"probes\":[0.1,0.2],\"load_suspect\":[],\"failed\":0,\"flaky\":0,\"total_sec\":213.2}" }"""
    val parsed = Bench.parseBenchArtifact(wrapper)
    assert(parsed == Map("dedup_minhash" -> 6.3815, "dedup_ngram" -> 2.2177),
      parsed.toString)
    // a tail that still carries the map opener: queries_max remnants
    // BEFORE it are excluded outright, reps_ok ints never match
    val full = """{"tail": "\"reps_ok\":{\"a\":4},\"queries_max\":{\"a\":9.0000},\"queries\":{\"a\":1.5000,\"b\":2.0000},\"probes\":[0.1],\"total_sec\":3.5}"}"""
    assert(Bench.parseBenchArtifact(full) == Map("a" -> 1.5, "b" -> 2.0))
    // a raw (unwrapped) bench line parses too
    val raw = Bench.render(
      Seq(Bench.QueryResult("q", Seq(1.25), Seq(0), None, 1)), 1, "sf")
    assert(Bench.parseBenchArtifact(raw) == Map("q" -> 1.25))
  }

  test("historyBands takes the per-query median of the recent rounds") {
    def art(m: (String, Double)*): String =
      "\"queries\":{" + m.map { case (k, v) => s""""$k":$v""" }
        .mkString(",") + "},\"probes\":[]"
    val arts = Seq(
      art("q" -> 33.9, "r" -> 1.0),               // ancient outlier
      art("q" -> 2.4, "r" -> 1.1),
      art("q" -> 2.6, "r" -> 1.2),
      art("q" -> 2.8, "s" -> 5.0),
      art("q" -> 3.0, "s" -> 5.2),
      art("q" -> 3.1),
      art("q" -> 6.4, "s" -> 5.1))                // the hot-window round
    val bands = Bench.historyBands(arts, lastN = 6, minRounds = 3)
    // q: last 6 = [2.4,2.6,2.8,3.0,3.1,6.4] -> median 2.9; the ancient
    // 33.9 fell out of the window, the hot 6.4 cannot drag the median
    assert(math.abs(bands("q") - 2.9) < 1e-9, bands.toString)
    // s has 3 samples inside the recent window -> banded; r's three
    // appearances are mostly ANCIENT (only 2 fall in the last staleN
    // artifacts) -> no band: the median must draw only on recent
    // values, else surviving old values dominate it and re-create the
    // stale-band false alarm the staleness cap exists to prevent
    assert(bands.contains("s") && !bands.contains("r"), bands.toString)
    // below minRounds -> no band
    assert(!Bench.historyBands(arts.take(2), minRounds = 3).contains("q"))
    // STALE: a query absent from the last `staleN` artifacts gets no
    // band — the driver tails are truncated, so old appearances can
    // survive while recent ones vanish, and a band from a code state
    // many rounds back flags the query's legitimate current level
    // (the r19 dedup_embedding_lsh false alarm: banded ~2s from
    // r6-r11 survivors vs a steady ~3.7s since r17)
    val stale = Seq(
      art("old" -> 2.0), art("old" -> 2.1), art("old" -> 2.2)) ++
      Seq.fill(6)(art("live" -> 1.0))
    val b2 = Bench.historyBands(stale)
    assert(!b2.contains("old") && b2.contains("live"), b2.toString)
    // the r19 ADVICE scenario the recent-only median closes: five
    // stale ~2s values plus ONE recent 3.7 used to pass the staleness
    // gate (one recent appearance) while the median stayed ~2s — a
    // cry-wolf band against the query's legitimate current level. Now
    // one recent appearance is below minRounds -> no band at all.
    val mostlyStale =
      Seq(art("c" -> 2.0), art("c" -> 2.1), art("c" -> 2.0),
        art("c" -> 2.1), art("c" -> 2.0)) ++
      Seq.fill(5)(art("x" -> 1.0)) :+ art("c" -> 3.7, "x" -> 1.0)
    val b3 = Bench.historyBands(mostlyStale)
    assert(!b3.contains("c") && b3.contains("x"), b3.toString)
  }

  test("loadRoundArtifacts prefers complete archives over truncated tails") {
    val dir = java.nio.file.Files.createTempDirectory("bench_hist").toFile
    def put(name: String, body: String): Unit =
      java.nio.file.Files.writeString(
        new java.io.File(dir, name).toPath, body)
    // r1: the driver tail lost the alphabetically-early agg_a entry to
    // truncation; the full archive carries it. r2: tail only (a round
    // predating the archive). r3: full only.
    put("BENCH_r01.json",
      """{"tail": "\"queries\":{\"zz\":2.0000},\"probes\":[0.1],\"total_sec\":9.0}"}""")
    put("BENCH_full_r01.json",
      """{"queries":{"agg_a":1.0000,"zz":2.0000},"probes":[0.1],"total_sec":9.0}""")
    put("BENCH_r02.json",
      """{"tail": "\"queries\":{\"zz\":2.1000},\"probes\":[0.1]"}""")
    put("BENCH_full_r03.json",
      """{"queries":{"agg_a":1.2000,"zz":2.2000},"probes":[0.1]}""")
    put("BENCH_full.json", // UNstamped current artifact: never history
      """{"queries":{"agg_a":9.9000},"probes":[]}""")
    put("notes.txt", "ignored")
    val arts = Bench.loadRoundArtifacts(dir).map(Bench.parseBenchArtifact)
    assert(arts.size == 3, arts.toString)
    assert(arts(0) == Map("agg_a" -> 1.0, "zz" -> 2.0), arts(0).toString)
    assert(arts(1) == Map("zz" -> 2.1), arts(1).toString)
    assert(arts(2) == Map("agg_a" -> 1.2, "zz" -> 2.2), arts(2).toString)
    // with full archives in history, the early query gets a band the
    // tails alone could never give it
    val raw = Bench.loadRoundArtifacts(dir)
    assert(Bench.historyBands(raw, minRounds = 2).contains("agg_a"))
    // the archive stamp counts DRIVER TAILS only: an in-round dev
    // archive (r3 full, above) must not bump the end-of-round run to
    // the wrong (next) round — newest tail is r2, so this run is r3
    assert(Bench.stampRound(dir) == 3, Bench.stampRound(dir).toString)
    assert(Bench.stampRound(
      java.nio.file.Files.createTempDirectory("empty").toFile) == 1)
    dir.listFiles().foreach(_.delete()); dir.delete()
  }

  test("driftWatch flags sustained creep the re-basing band misses; report-only") {
    def art(m: (String, Double)*): String =
      "\"queries\":{" + m.map { case (k, v) => s""""$k":$v""" }
        .mkString(",") + "},\"probes\":[]"
    // q crept 1.0 -> 1.6 -> 1.7 across rounds; current min 1.8. Each
    // step is within the 1.5x window band of its recent median, so
    // windowSuspects never fires — but current AND the last two
    // committed appearances all exceed 1.5x the best-ever 1.0.
    val hist = Seq(art("q" -> 1.0, "ok" -> 1.0), art("q" -> 1.6, "ok" -> 1.0),
      art("q" -> 1.7, "ok" -> 1.61))
    val results = Seq(
      Bench.QueryResult("q", Seq(1.8), Seq(0), None, 1),
      // ok's current min is high but its PREVIOUS appearance (1.0) was
      // at the best -> not sustained -> not flagged
      Bench.QueryResult("ok", Seq(1.8), Seq(0), None, 1),
      // no history -> never flagged
      Bench.QueryResult("new", Seq(9.0), Seq(0), None, 1))
    val drift = Bench.driftWatch(hist, results)
    assert(drift == Map("q" -> 1.0), drift.toString)
    // an ancient PRE-PROBE artifact (the r5-r7 no-flush methodology:
    // no "probes" log) carrying a lower floor is ignored — its mins
    // are non-comparable and would pin a permanent false flag
    val preProbe = """"queries":{"q":0.1,"ok":0.1}"""
    val drift2 = Bench.driftWatch(preProbe +: hist, results)
    assert(drift2 == Map("q" -> 1.0), drift2.toString)
    // a recovered query (current min back at best) clears
    val rec = Bench.driftWatch(hist,
      Seq(Bench.QueryResult("q", Seq(1.0), Seq(0), None, 1)))
    assert(rec.isEmpty, rec.toString)
    // the annotation rides the artifact, after "probes" so it can
    // never bleed into parseBenchArtifact's min-map region
    val line = Bench.render(results, 1, "sf", drift = drift)
    assert(line.contains(""""drift_watch":{"q":1.0000}"""), line)
    assert(line.indexOf("\"drift_watch\"") > line.indexOf("\"probes\""))
    val parsed = Bench.parseBenchArtifact(line)
    assert(parsed.get("q").contains(1.8), parsed.toString)
  }

  test("windowSuspects flags mins outside the committed band; rerun can clear the flag") {
    val bands = Map("slow" -> 3.0, "fine" -> 3.0)
    val seeded = Seq(
      Bench.QueryResult("slow", Seq(6.4, 6.5), Seq(0, 1), None, 2),
      Bench.QueryResult("fine", Seq(3.2, 4.0), Seq(0, 1), None, 2),
      Bench.QueryResult("unbanded", Seq(99.0), Seq(0), None, 1))
    assert(Bench.windowSuspects(seeded, bands) == Seq("slow"))
    // the guard gives the suspect an end-of-suite sample; a clean
    // window's sample lowers the min and the flag clears itself
    val fast = (s: SparkSession, _: String) => s.range(3).toDF("id")
    val log = new Bench.ProbeLog
    val out = Bench.rerunWindowSuspects(spark, Seq("slow" -> fast),
      seeded, "unused", bands, factor = 1.5, log = log)
    val r = out.find(_.name == "slow").get
    assert(r.okReps == 3 && r.okTimes.min < 4.5, r.okTimes.toString)
    assert(Bench.windowSuspects(out, bands).isEmpty)
    // untouched queries kept their samples
    assert(out.find(_.name == "fine").get.okReps == 2)
    val line = Bench.render(out, 2, "sf", log.times, bands)
    assert(line.contains(""""window_suspect":[]"""), line)
  }

  test("a suspect still out of band after the reruns keeps its annotation and band") {
    // a query function pinned at ~real time cannot dip under the band:
    // the flag must survive the rerun passes and ride the artifact
    val slowFn = (s: SparkSession, _: String) => {
      Thread.sleep(300); s.range(3).toDF("id")
    }
    val bands = Map("stuck" -> 0.01)
    val seeded = Seq(Bench.QueryResult("stuck", Seq(0.3), Seq(0), None, 1))
    val log = new Bench.ProbeLog
    val out = Bench.rerunWindowSuspects(spark, Seq("stuck" -> slowFn),
      seeded, "unused", bands, factor = 1.5, log = log, passes = 2)
    // two passes ran (bracketing probes) and added samples, all >= 0.3s
    assert(out.head.okReps == 3, out.head.okTimes.toString)
    val line = Bench.render(out, 1, "sf", log.times, bands)
    assert(line.contains(""""window_suspect":["stuck"]"""), line)
    assert(line.contains(""""window_band":{"stuck":0.0100}"""), line)
    // the untrustworthy row carries its max alongside the min
    assert(line.contains(""""queries_max":{"stuck":"""), line)
    // tail-safe: the annotation sits after the min map
    assert(line.lastIndexOf("\"window_suspect\":") >
      line.lastIndexOf("\"queries\":"), line)
  }

  test("warmup discovers tables by listing the SF dir instead of a hardcoded list") {
    val dir = java.nio.file.Files.createTempDirectory("bench-tables").toFile
    try {
      new java.io.File(dir, "documents.parquet").mkdir()
      new java.io.File(dir, "zeta.parquet").createNewFile()
      new java.io.File(dir, "notes.txt").createNewFile()
      assert(Bench.tablesIn(dir.getAbsolutePath) ==
        Seq("documents.parquet", "zeta.parquet"))
      assert(Bench.tablesIn("/nonexistent-dir-xyz").isEmpty)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
