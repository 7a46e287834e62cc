package graft

import java.nio.file.{Files, Paths}
import scala.collection.mutable
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import graft.core.{DbException, Engine}
import graft.lang.Parser

/** Differential fuzzing: random operator scripts evaluated by the engine
  * AND by an independent in-memory model of the reference semantics,
  * comparing every emitted line and the first error code. Covers the
  * interactions deterministic tests don't walk: bindings as snapshots
  * across mutations (copy-on-write versions), fetch length checks after
  * per-column inserts (DBECOLDIFFLEN), divergent tombstones between
  * source and target columns, ordinal math over differently-shaped
  * fetches (DBEINTERMDIFFLEN), empty-input aggregate identities, and
  * truncating div with DBEDIVZERO precedence.
  */
object EngineFuzzProps extends Properties("EngineFuzz") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.spark

  private val ColNames = Seq("va", "vb", "vc")

  // ---- independent model of the reference semantics ----

  /** Bound intermediates are SNAPSHOTS: the engine's bindings read
    * retained copy-on-write versions, so the model materializes at bind
    * time too.
    */
  private final class Model {
    val cols: Map[String, mutable.ArrayBuffer[Option[Int]]] =
      ColNames.map(_ -> mutable.ArrayBuffer.empty[Option[Int]]).toMap
    // pos var -> (ids, srcLen at select time); val var -> ordinal values
    val posVars = mutable.Map.empty[String, (Seq[Int], Int)]
    val valVars = mutable.Map.empty[String, Seq[Int]]
    val out = mutable.Buffer.empty[String]

    def select(v: String, c: String, bounds: Option[(Int, Int)]): Option[String] = {
      val buf = cols(c)
      val ids = buf.indices.filter { i =>
        buf(i).exists(x => bounds.forall { case (lo, hi) => x >= lo && x <= hi })
      }
      posVars(v) = (ids, buf.length); valVars.remove(v); None
    }

    def fetch(v: String, c: String, p: String): Option[String] = {
      val (ids, srcLen) = posVars(p)
      if (srcLen != cols(c).length) return Some("DBECOLDIFFLEN")
      valVars(v) = ids.flatMap(i => if (i < cols(c).length) cols(c)(i) else None)
      posVars.remove(v); None
    }

    def agg(kw: String, in: String): Option[String] = {
      val vs = valVars(in)
      val s = kw match {
        case "min"   => vs.foldLeft(Int.MaxValue)(math.min).toString
        case "max"   => vs.foldLeft(Int.MinValue)(math.max).toString
        case "sum"   => vs.foldLeft(0)(_ + _).toString // wrapping int
        case "count" => vs.size.toString
        case "avg" =>
          if (vs.isEmpty) return Some("DBEDIVZERO")
          (vs.map(_.toLong).sum / vs.size).toString
      }
      out += s; None
    }

    def mathOp(kw: String, a: String, b: String): Option[String] = {
      val (x, y) = (valVars(a), valVars(b))
      if (kw == "div") {
        if (x.size != y.size) return Some("DBEINTERMDIFFLEN")
        if (y.contains(0)) return Some("DBEDIVZERO")
      } else if (x.size != y.size) return Some("DBEINTERMDIFFLEN")
      out ++= x.zip(y).map { case (l, r) =>
        val v = kw match {
          case "add" => l + r
          case "sub" => l - r
          case "mul" => l * r
          case "div" => (l.toLong / r.toLong).toInt
        }
        v.toString
      }
      None
    }

    def insert(cv: Seq[(String, Int)]): Option[String] = {
      cv.foreach { case (c, x) => cols(c) += Some(x) }; None
    }

    def delete(p: String, cs: Seq[String]): Option[String] = {
      val ids = posVars(p)._1
      for (c <- cs; i <- ids; if i < cols(c).length) cols(c)(i) = None
      None
    }

    def update(p: String, c: String, x: Int): Option[String] = {
      val ids = posVars(p)._1
      for (i <- ids; if i < cols(c).length && cols(c)(i).isDefined)
        cols(c)(i) = Some(x)
      None
    }

    def print(v: String): Option[String] = {
      if (posVars.contains(v)) out ++= posVars(v)._1.map(_.toString)
      else out ++= valVars(v).map(_.toString)
      None
    }

    def tuple(vs: Seq[String]): Option[String] = {
      val cols = vs.map(valVars)
      if (cols.map(_.size).distinct.size > 1) return Some("DBEINTERMDIFFLEN")
      out ++= cols.transpose.map(_.mkString("(", ",", ")"))
      None
    }
  }

  // ---- script generation (seeded, stateful validity tracking) ----

  private def genCase(seed: Long): (Seq[String], Seq[String], Option[String]) = {
    val rnd = new scala.util.Random(seed)
    val m = new Model
    val lines = mutable.Buffer.empty[String]
    var err: Option[String] = None
    var pn = 0; var vn = 0
    def freshP() = { pn += 1; s"p$pn" }
    def freshV() = { vn += 1; s"v$vn" }
    def pick[A](xs: Seq[A]) = xs(rnd.nextInt(xs.size))

    // seed data: per-column independent loads via insert (6-10 rows)
    val rows = 6 + rnd.nextInt(5)
    for (_ <- 0 until rows) {
      val cv = ColNames.map(c => c -> rnd.nextInt(16))
      lines += cv.map { case (c, x) => s"$c,$x" }.mkString("insert(", ",", ")")
      m.insert(cv)
    }

    val steps = 8 + rnd.nextInt(6)
    var i = 0
    while (i < steps && err.isEmpty) {
      val posAvail = m.posVars.keys.toSeq.sorted
      val valAvail = m.valVars.keys.toSeq.sorted
      val choice = rnd.nextInt(11)
      val step: Option[(String, Option[String])] = choice match {
        case 0 | 1 =>
          val (v, c) = (freshP(), pick(ColNames))
          if (rnd.nextBoolean()) {
            val lo = rnd.nextInt(12); val hi = lo + rnd.nextInt(8)
            Some(s"$v=select($c,$lo,$hi)" -> m.select(v, c, Some((lo, hi))))
          } else Some(s"$v=select($c)" -> m.select(v, c, None))
        case 2 | 3 if posAvail.nonEmpty =>
          val (v, c, p) = (freshV(), pick(ColNames), pick(posAvail))
          Some(s"$v=fetch($c,$p)" -> m.fetch(v, c, p))
        case 4 if valAvail.nonEmpty =>
          val (kw, in) = (pick(Seq("min", "max", "sum", "count", "avg")), pick(valAvail))
          Some(s"$kw($in)" -> m.agg(kw, in))
        case 5 if valAvail.nonEmpty =>
          val (kw, a, b) = (pick(Seq("add", "sub", "mul", "div")),
            pick(valAvail), pick(valAvail))
          Some(s"$kw($a,$b)" -> m.mathOp(kw, a, b))
        case 6 =>
          // per-column independent insert — desyncs nextIds on purpose
          val cs = rnd.shuffle(ColNames).take(1 + rnd.nextInt(3))
          val cv = cs.map(c => c -> rnd.nextInt(16))
          Some(cv.map { case (c, x) => s"$c,$x" }
            .mkString("insert(", ",", ")") -> m.insert(cv))
        case 7 if posAvail.nonEmpty =>
          val (p, cs) = (pick(posAvail), rnd.shuffle(ColNames).take(1 + rnd.nextInt(3)))
          Some(s"delete($p,${cs.mkString(",")})" -> m.delete(p, cs))
        case 8 if posAvail.nonEmpty =>
          val (p, c, x) = (pick(posAvail), pick(ColNames), rnd.nextInt(16))
          Some(s"update($p,$c,$x)" -> m.update(p, c, x))
        case 9 if posAvail.nonEmpty || valAvail.nonEmpty =>
          val v = pick(posAvail ++ valAvail)
          Some(s"print($v)" -> m.print(v))
        case 10 if valAvail.nonEmpty =>
          // ordinal zip across 1-3 value vars, possibly cross-lineage
          // (differently-shaped fetches must raise DBEINTERMDIFFLEN)
          val k = 1 + rnd.nextInt(math.min(3, valAvail.size))
          val vs = Seq.fill(k)(pick(valAvail))
          Some(s"tuple(${vs.mkString(",")})" -> m.tuple(vs))
        case _ => None
      }
      step.foreach { case (line, stepErr) => lines += line; err = stepErr }
      i += 1
    }
    (lines.toSeq, m.out.toSeq, err)
  }

  /** The same generated scripts through the CLIENT/SERVER topology: a
    * real socket client against [[graft.server.TcpServer]] must produce
    * the model's exact output lines and first error CODE (the wire
    * renders `-ERR CODE: detail`; the client stops at the first error
    * like the in-process harness above). Transitively with the first
    * property this pins socket == engine == reference model across the
    * fuzzed interaction space, not just the deterministic spec scripts.
    */
  property("random scripts over the socket match the reference model") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue)) { seed =>
      val (lines, wantOut, wantErr) = genCase(seed)
      val db = Files.createTempDirectory("fuzztcpdb").toString
      val e = new Engine(spark, db)
      e.execute(ColNames.map(c => s"""create($c,"unsorted")""").mkString("\n"))
      val server = new graft.server.TcpServer(e, threads = 2)
      val port = server.start()
      val got = mutable.Buffer.empty[String]
      var gotErr: Option[String] = None
      try {
        graft.server.NetClient.run("127.0.0.1", port,
          lines.iterator.takeWhile(_ => gotErr.isEmpty),
          got += _,
          msg => if (gotErr.isEmpty) gotErr = Some(msg.takeWhile(_ != ':')))
      } finally {
        server.close()
        e.close()
      }
      val ok = got.toSeq == wantOut && gotErr == wantErr
      ok :| s"seed=$seed script=\n${lines.mkString("\n")}\n" +
        s"socket=(${got.mkString(",")}, $gotErr) model=(${wantOut.mkString(",")}, $wantErr)"
    }

  /** The same differential property with the engine in OBJECT-STORE
    * mode: every mutation in the fuzzed script drives a versioned
    * epoch-fenced catalog commit (PUT + rank + GC) instead of a rename,
    * and the load path runs under the writer LEASE — so the rename-less
    * control plane is pinned to the reference model across the same
    * random interaction space as the local fast path, not just the
    * deterministic ObjectStoreSpec scenarios. settle=0 keeps the
    * per-case acquire cheap; the protocol under test is the commit
    * path, not the claim race (ObjectStoreSpec covers that).
    *
    * Runs once per store CAPABILITY: the plain emulated path
    * (HadoopStoreIO — settle-verify claims, read-then-write
    * heartbeats) and the CAS path (a conditional-write overlay
    * installed through the engine's store seam — atomic claims and
    * fenced writes), so both halves of the protocol face the same
    * random interaction space. The engine and session close in a
    * finally: a throwing eval must not leak the lease heartbeat
    * daemon or the jvmHeld key into later cases (ScalaCheck
    * shrinking runs MANY).
    */
  private def objStoreCase(seed: Long, withCas: Boolean): Prop = {
    val (lines, wantOut, wantErr) = genCase(seed)
    val db = Files.createTempDirectory(
      if (withCas) "fuzzobjcasdb" else "fuzzobjdb").toString
    sys.props("graft.store.object") = "true"
    sys.props("graft.lease.settle.ms") = "0"
    if (withCas)
      Engine.storeIoOverride = Some(d => CasOverlayStoreIO.forDir(d,
        new graft.core.HadoopStoreIO(spark.sparkContext.hadoopConfiguration)))
    val got = mutable.Buffer.empty[String]
    var gotErr: Option[String] = None
    try {
      val e =
        try new Engine(spark, db)
        finally {
          sys.props.remove("graft.store.object")
          sys.props.remove("graft.lease.settle.ms")
        }
      try {
        e.execute(ColNames.map(c => s"""create($c,"unsorted")""").mkString("\n"))
        val session = e.newSession()
        lines.iterator.takeWhile(_ => gotErr.isEmpty).foreach { line =>
          val op = Parser.parseLine(line).getOrElse(
            sys.error(s"generator produced unparseable line: $line"))
          try got ++= session.eval(op)
          catch { case ex: DbException => gotErr = Some(ex.code) }
        }
      } finally e.close() // releases the lease (tombstone) and the jvmHeld key
    } finally if (withCas) Engine.storeIoOverride = None
    val ok = got.toSeq == wantOut && gotErr == wantErr
    ok :| s"seed=$seed cas=$withCas script=\n${lines.mkString("\n")}\n" +
      s"objstore=(${got.mkString(",")}, $gotErr) model=(${wantOut.mkString(",")}, $wantErr)"
  }

  property("random scripts in OBJECT-STORE mode match the reference model") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue))(objStoreCase(_, withCas = false))

  property("random scripts in OBJECT-STORE mode with store CAS match the reference model") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue))(objStoreCase(_, withCas = true))

  property("random scripts match the reference model line-for-line") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue)) { seed =>
      val (lines, wantOut, wantErr) = genCase(seed)
      val db = Files.createTempDirectory("fuzzdb").toString
      val e = new Engine(spark, db)
      e.execute(ColNames.map(c => s"""create($c,"unsorted")""").mkString("\n"))
      val session = e.newSession()
      val got = mutable.Buffer.empty[String]
      var gotErr: Option[String] = None
      lines.iterator.takeWhile(_ => gotErr.isEmpty).foreach { line =>
        val op = Parser.parseLine(line).getOrElse(
          sys.error(s"generator produced unparseable line: $line"))
        try got ++= session.eval(op)
        catch { case ex: DbException => gotErr = Some(ex.code) }
      }
      // outputs are materialized above; release the writer lock so a
      // long property run doesn't hold one lock-file fd per case
      e.close()
      val ok = got.toSeq == wantOut && gotErr == wantErr
      ok :| s"seed=$seed script=\n${lines.mkString("\n")}\n" +
        s"engine=(${got.mkString(",")}, $gotErr) model=(${wantOut.mkString(",")}, $wantErr)"
    }
}
