package graft

import org.apache.spark.sql.types.TimestampNTZType
import graft.queries.PipelineQueries

/** Regression pin for the round-10 testdata drift: the driver regenerated
  * `events.parquet` with `Timestamp(isAdjustedToUTC=false, µs)`, which
  * Spark 4.1 infers as TIMESTAMP_NTZ, and the event-time adapter
  * (`PipelineQueries.eventMs`) rejected it — six queries died. This suite
  * reads a checked-in parquet fixture with that EXACT physical type
  * (src/test/resources/fixtures/ntz_events) through the real event
  * queries, so the next silent regeneration (ns → µs → ?) fails here
  * first with a precise message instead of in the driver's round run.
  */
class NtzFixtureSpec extends SparkSpec {

  private val dir = getClass.getResource("/fixtures/ntz_events").getPath

  test("fixture surfaces as TIMESTAMP_NTZ (pins the driver's format)") {
    val ts = spark.read.parquet(s"$dir/events.parquet").schema("ts")
    assert(ts.dataType == TimestampNTZType,
      s"fixture drifted: ts is ${ts.dataType}, expected TIMESTAMP_NTZ — " +
        "if the driver's testdata format changed again, extend eventMs")
  }

  test("eventsTimeWindow resolves NTZ ts to exact UTC epoch-hours") {
    // 2026-01-01T00:00Z = epoch-hour 490896 (1767225600 / 3600)
    val out = PipelineQueries.eventsTimeWindow(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 490896L, 2L, 375L),
      (1L, 490897L, 1L, 75L),
      (2L, 490899L, 2L, 1010L)))
  }

  test("eventsSessionize splits on >30min gaps over NTZ millis") {
    val out = PipelineQueries.eventsSessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // user 1: 00:10 → 00:50 (40min, split) → 01:05 (15min) = 2 sessions;
    // user 2: 03:00 → 03:45 (45min, split) = 2 sessions
    assert(out.toSeq == Seq((1L, 2L), (2L, 2L)))
  }
}
