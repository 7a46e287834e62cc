package graft

import java.nio.file.{Files, Paths}
import scala.collection.mutable.ArrayBuffer

/** In-memory model of the column-store semantics (positions with
  * tombstones, value join, truncating int avg) plus the seeded data
  * generator for the reference challenge workloads.
  *
  * Used by [[GoldenFixtureGen]] to produce the VENDORED fixtures under
  * `src/test/resources/golden` (CSVs + literal `.expected` tuple files);
  * [[GoldenChallengeSpec]] then byte-diffs engine output against those
  * files — the model is out of the test loop. An independent Python
  * replay cross-checks the `.expected` values at generation time
  * (FIXTURES.md §2).
  */
object GoldenModel {

  /** Per-column value arrays, None = tombstone. */
  final class Model {
    val cols = scala.collection.mutable.LinkedHashMap[String, ArrayBuffer[Option[Int]]]()
    def create(c: String): Unit = cols.getOrElseUpdate(c, ArrayBuffer())
    def insert(cv: (String, Int)*): Unit = cv.foreach { case (c, v) => cols(c) += Some(v) }
    def selectRange(c: String, lo: Long, hi: Long): Seq[Int] =
      cols(c).zipWithIndex.collect { case (Some(v), i) if v >= lo && v <= hi => i }.toSeq
    def fetch(c: String, ids: Seq[Int]): Seq[(Int, Int)] = // (id, value)
      ids.map(i => i -> cols(c)(i).get)
    def delete(ids: Seq[Int], cs: Seq[String]): Unit =
      for (c <- cs; i <- ids) cols(c)(i) = None
    def update(ids: Seq[Int], c: String, v: Int): Unit =
      for (i <- ids) if (cols(c)(i).isDefined) cols(c)(i) = Some(v)

    /** The challenge query: join t and u on (ta, ua) values after the two
      * selects, then truncating int avg of td / uc over the pair lists.
      */
    def challengeQuery(): (Int, Int) = {
      val tIds = selectRange("tb", 1000, 1000)
      val taF = fetch("ta", tIds)
      val uIds = selectRange("ud", 9000, 9000000)
      val uaF = fetch("ua", uIds)
      val pairs = for ((ti, tv) <- taF; (ui, uv) <- uaF if tv == uv) yield (ti, ui)
      require(pairs.nonEmpty, "challenge data must produce join matches")
      def avg(vals: Seq[Int]): Int =
        (vals.map(_.toLong).sum / vals.size).toInt
      (avg(pairs.map { case (ti, _) => cols("td")(ti).get }),
        avg(pairs.map { case (_, ui) => cols("uc")(ui).get }))
    }
  }

  /** Seeded t/u data with the FIXTURES.md §2 value shapes: tb probes at
    * 1000, ud mostly inside [9000, 9000000], join keys with shared range.
    */
  def genData(model: Model, dir: String): (String, String) = {
    val rnd = new java.util.Random(4242)
    Seq("ta", "tb", "tc", "td", "ua", "ub", "uc", "ud").foreach(model.create)
    val t = new StringBuilder("ta,tb,tc,td\n")
    for (_ <- 1 to 3000) {
      val ta = rnd.nextInt(400)
      val tb = if (rnd.nextInt(10) == 0) 1000 else rnd.nextInt(999)
      val tc = rnd.nextInt(500000)
      val td = rnd.nextInt(1000000)
      model.insert("ta" -> ta, "tb" -> tb, "tc" -> tc, "td" -> td)
      t ++= s"$ta,$tb,$tc,$td\n"
    }
    val u = new StringBuilder("ua,ub,uc,ud\n")
    for (_ <- 1 to 2000) {
      val ua = rnd.nextInt(400)
      val ub = rnd.nextInt(Int.MaxValue)
      val uc = rnd.nextInt(900000)
      val ud = 9000 + rnd.nextInt(9000000 - 9000)
      model.insert("ua" -> ua, "ub" -> ub, "uc" -> uc, "ud" -> ud)
      u ++= s"$ua,$ub,$uc,$ud\n"
    }
    val tPath = s"$dir/t.csv"; val uPath = s"$dir/u.csv"
    Files.writeString(Paths.get(tPath), t.toString)
    Files.writeString(Paths.get(uPath), u.toString)
    (tPath, uPath)
  }

  /** The p4challenge 6-round replay (the reference script's mutations,
    * p4challenge/p4challenge.txt verbatim); round 1 doubles as the
    * p3challenge expected tuple (same seeded data, fresh load).
    */
  def expectedRounds(model: Model): Seq[String] = {
    val expected = ArrayBuffer[String]()
    def round(): Unit = {
      val (a, b) = model.challengeQuery(); expected += s"($a,$b)"
    }
    round() // 1: post-load
    model.insert("ta" -> 412234, "tb" -> 123231, "tc" -> 54323, "td" -> 764543)
    model.insert("ta" -> 1312312, "tb" -> 5321234, "tc" -> 3453241, "td" -> 14232342)
    model.insert("ta" -> 39485394, "tb" -> 123124, "tc" -> 23429, "td" -> 1293)
    model.insert("ta" -> 234231, "tb" -> 1000, "tc" -> 23425, "td" -> 21234)
    model.insert("ta" -> 30293, "tb" -> 123901, "tc" -> 23491, "td" -> 12303)
    round() // 2: post-insert
    model.delete(model.selectRange("td", 0, 99999), Seq("ta", "tb", "tc", "td"))
    round() // 3: post t-delete
    model.update(model.selectRange("ub", 500001, 2147483647L), "uc", 10000)
    round() // 4: post u-update
    model.delete(model.selectRange("ua", 100000, 200000), Seq("ua", "ub", "uc", "ud"))
    round() // 5: post u-delete
    model.update(model.selectRange("tc", 10000, 200000), "ta", 54321)
    round() // 6: post t-update
    expected.toSeq
  }
}

/** Regenerates the vendored golden fixtures. Run with
  * `sbt "Test/runMain graft.GoldenFixtureGen"` (writes into
  * src/test/resources/golden), then re-run the Python cross-check in
  * FIXTURES.md §2 before committing changed fixtures.
  */
object GoldenFixtureGen {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("src/test/resources/golden")
    Files.createDirectories(Paths.get(dir))
    val m = new GoldenModel.Model
    GoldenModel.genData(m, dir)
    val rounds = GoldenModel.expectedRounds(m)
    Files.writeString(Paths.get(s"$dir/p3.expected"), rounds.head + "\n")
    Files.writeString(Paths.get(s"$dir/p4.expected"),
      rounds.mkString("", "\n", "\n"))
    println(s"golden fixtures written to $dir; rounds = $rounds")
  }
}
