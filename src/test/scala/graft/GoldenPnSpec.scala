package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.core.Engine
import graft.server.{NetClient, TcpServer}

/** The generated pN golden suites ([[GoldenPnGen]]): 13 vendored
  * scripts spanning the p2/p3/p4 assignment surfaces and the perftest
  * template per join keyword, each byte-diffed against its frozen
  * `.expected` — IN-PROCESS and OVER A REAL SOCKET. The `# RESTART`
  * marker splits a script across engine (and server) restarts, which is
  * the p2 spec's persistence requirement run literally.
  */
class GoldenPnSpec extends SparkSpec {

  private val names = Seq(
    "p2_scan_unsorted", "p2_sorted_range", "p2_btree_point", "p2_restart",
    "p3_perftest_hash", "p3_perftest_sort", "p3_perftest_loop",
    "p3_perftest_tree", "p3_math_chain", "p3_aggs",
    "p4_insert_delete", "p4_update", "p4_mutation_mix")

  private def resource(name: String): java.nio.file.Path = {
    val url = getClass.getResource(s"/golden/pn/$name")
    assume(url != null, s"vendored pn fixture $name missing — run Test/runMain graft.GoldenPnGen")
    Paths.get(url.toURI)
  }

  /** Script text with `{{DIR}}` resolved to the classpath fixture dir,
    * split into restart segments.
    */
  private def segments(name: String): Seq[String] = {
    val dir = resource("r.csv").getParent.toString
    Files.readString(resource(s"$name.txt")).replace("{{DIR}}", dir)
      .split("(?m)^# RESTART$").toSeq
  }

  private def expected(name: String): Seq[String] =
    Files.readAllLines(resource(s"$name.expected")).asScala
      .filter(_.nonEmpty).toSeq

  for (name <- names) {
    test(s"$name byte-diffs in-process (engine restart per segment)") {
      val db = tmpDir(s"pn_${name}_db")
      val out = segments(name).flatMap { seg =>
        val e = new Engine(spark, db)
        try e.execute(seg) finally e.close()
      }
      assert(out == expected(name))
    }

    test(s"$name byte-diffs over TcpServer/NetClient (server restart per segment)") {
      val db = tmpDir(s"pn_${name}_tcpdb")
      val out = collection.mutable.Buffer[String]()
      segments(name).foreach { seg =>
        val engine = new Engine(spark, db)
        val server = new TcpServer(engine)
        val port = server.start()
        try {
          val failed = NetClient.run("127.0.0.1", port, seg.linesIterator,
            out += _, err => throw new IllegalStateException(s"server error: $err"))
          assert(!failed, s"$name segment failed over the socket")
        } finally { server.close(); engine.close() }
      }
      assert(out.toSeq == expected(name))
    }
  }
}
