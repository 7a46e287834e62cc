package graft

import org.apache.spark.sql.types._

/** Pins the driver testdata contract the engine adapters are built
  * against — the round-10 lesson generalized: the driver regenerated
  * `events.parquet` with a different timestamp physical type and six
  * queries died at round time with no in-suite signal. This spec makes
  * ANY schema drift in any table fail here first, naming the table and
  * column. Event-time columns accept the three forms the adapters
  * handle (`PipelineQueries.eventMs`: long nanos under nanosAsLong,
  * TIMESTAMP, TIMESTAMP_NTZ); every other column is pinned exactly. If
  * this test goes red after a regeneration, extend the adapter FIRST,
  * then the accepted set here.
  */
class TestdataSchemaSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private val ts = "TS" // any adapter-accepted event-time form
  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> ts, "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> ts),
    "events" -> Seq("event_id" -> "bigint", "ts" -> ts,
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  private def accepts(want: String, got: DataType): Boolean = want match {
    case `ts` => got == TimestampType || got == TimestampNTZType ||
      got == LongType
    case other => got.simpleString == other
  }

  for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"testdata contract: $table") {
      val schema = spark.read.parquet(s"$sf/$table.parquet").schema
      assert(schema.fields.map(_.name).toSeq == cols.map(_._1),
        s"$table columns drifted: ${schema.fields.map(_.name).toSeq} " +
          s"vs expected ${cols.map(_._1)}")
      for ((name, want) <- cols) {
        val got = schema(name).dataType
        assert(accepts(want, got),
          s"$table.$name drifted to ${got.simpleString} (expected $want" +
            (if (want == ts) " = timestamp/timestamp_ntz/bigint-nanos" else "") +
            ") — extend the adapter, then this accepted set")
      }
    }
  }
}
