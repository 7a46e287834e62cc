package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import graft.core.Engine

/** Golden end-to-end runs of the reference's own challenge scripts
  * (/root/reference/p3challenge/p3challenge.txt and
  * p4challenge/p4challenge.txt, verbatim query text, load paths adapted)
  * against VENDORED fixtures: seeded CSVs plus literal `.expected` tuple
  * files under src/test/resources/golden — a byte-diff, like the
  * reference's own test.sh. The fixtures were produced by
  * [[GoldenFixtureGen]]'s in-memory model and cross-checked by an
  * independent Python replay (FIXTURES.md §2); neither is in the test
  * loop here.
  */
class GoldenChallengeSpec extends SparkSpec {

  private def golden(name: String): Path = {
    val url = getClass.getResource(s"/golden/$name")
    assume(url != null, s"vendored golden fixture $name missing")
    Paths.get(url.toURI)
  }

  private def referenceScript(name: String): String = {
    assume(Files.exists(Paths.get("/root/reference")),
      "reference checkout required at /root/reference")
    val raw = Files.readString(Paths.get(s"/root/reference/$name"))
    raw.replace("\"t.csv\"", s""""${golden("t.csv")}"""")
      .replace("\"u.csv\"", s""""${golden("u.csv")}"""")
  }

  private def expectedLines(name: String): Seq[String] =
    Files.readAllLines(golden(name)).asScala.filter(_.nonEmpty).toSeq

  test("p3challenge script byte-diffs against vendored .expected") {
    val e = new Engine(spark, tmpDir("golden_p3_db"))
    e.execute(referenceScript("p3challenge/load.txt"))
    val out = e.execute(referenceScript("p3challenge/p3challenge.txt"))
    assert(out == expectedLines("p3.expected"))
  }

  test("p4challenge script byte-diffs against vendored .expected") {
    val e = new Engine(spark, tmpDir("golden_p4_db"))
    e.execute(referenceScript("p4challenge/load.txt"))
    val out = e.execute(referenceScript("p4challenge/p4challenge.txt"))
    assert(out == expectedLines("p4.expected"))
  }

  /** The same golden scripts through the CLIENT/SERVER topology: a real
    * socket client ([[graft.server.NetClient]]) drives the p3 challenge
    * against a [[graft.server.TcpServer]], and stdout must STILL
    * byte-diff against the vendored `.expected` — the reference's own
    * deployment shape (client ⇄ TCP ⇄ server), end to end.
    */
  test("p3challenge through TcpServer/NetClient byte-diffs the same golden") {
    val engine = new Engine(spark, tmpDir("golden_tcp_db"))
    val server = new graft.server.TcpServer(engine)
    val port = server.start()
    try {
      val out = collection.mutable.Buffer[String]()
      val err = collection.mutable.Buffer[String]()
      def run(script: String): Unit = {
        val failed = graft.server.NetClient.run("127.0.0.1", port,
          script.linesIterator, out += _, err += _)
        assert(!failed, err.mkString("; "))
      }
      run(referenceScript("p3challenge/load.txt"))
      out.clear()
      run(referenceScript("p3challenge/p3challenge.txt"))
      assert(out.toSeq == expectedLines("p3.expected"))
    } finally {
      server.close()
      engine.close()
    }
  }

  /** The reference ships p4 as per-statement splits too
    * (p4challenge/individual/p4c-{0-load,1..6}.txt) whose expecteds are
    * exactly the 6 lines of p4challenge.expected (its harness runs each
    * split through a FRESH client against the same persistent db). The
    * twin here is stronger than a fresh session: a fresh Engine per
    * split, so every mutation interleaving is pinned across a full
    * catalog reload — state wrongly held in a session or engine (caches,
    * memos, orphan flags) would shift a later split's tuple.
    */
  test("p4 individual splits: fresh engine per split, byte-diff each") {
    val db = tmpDir("golden_p4ind_db")
    val loader = new Engine(spark, db)
    loader.execute(referenceScript("p4challenge/individual/p4c-0-load.txt"))
    loader.close() // one live writer per dbDir: each split takes the lock
    val expected = expectedLines("p4.expected")
    (1 to 6).foreach { k =>
      val e = new Engine(spark, db)
      val out = e.execute(referenceScript(s"p4challenge/individual/p4c-$k.txt"))
      e.close()
      assert(out == Seq(expected(k - 1)), s"split p4c-$k")
    }
  }
}
