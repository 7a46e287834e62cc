package graft

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Independent in-memory interpreter of the reference's operator
  * language — the EXPECTED side of the generated pN golden suites
  * ([[GoldenPnGen]] / [[GoldenPnSpec]]). Deliberately shares no code
  * with the engine (own line parser, own evaluation): the reference
  * semantics are re-derived from the assignment specs
  * (/root/reference/assts/p2.txt, p3.txt, p4.txt) and the reference
  * sources cited per method, so an engine bug and a model bug cannot
  * cancel through a shared implementation.
  *
  * Semantics implemented (file:line = reference):
  *   - positions are dense at load/insert, stable under delete
  *     (tombstones, never reused — storage.c:1784-1788)
  *   - selects return live positions ascending; bounds inclusive
  *   - all four joins emit the same value-match pair multiset
  *     (cross product per matching value)
  *   - min/max of empty = INT_MAX/INT_MIN; sum wraps at 32 bits;
  *     avg = truncating integer division (aggregate.c:18-72)
  *   - math ops wrap at 32 bits; div truncates toward zero
  *     (aggregate.c:100-182)
  *   - emission formats: ids/values one per line, tuples `(a,b,...)`
  *     (client.c:44-128); non-join emissions in ascending-id order
  *
  * Scope: the happy path the generated scripts exercise. Error cases
  * (DBE*) are covered by EngineSpec/CliSpec, not golden byte-diffs.
  */
final class PnModel {
  import PnModel.{Ids, Value, Vals}

  private val cols = mutable.LinkedHashMap[String, ArrayBuffer[Option[Int]]]()
  private val env = mutable.Map[String, Value]()

  private def wrap32(x: Long): Int =
    (Math.floorMod(x + 2147483648L, 4294967296L) - 2147483648L).toInt

  private def live(c: String): Seq[(Int, Int)] =
    cols(c).zipWithIndex.collect { case (Some(v), i) => (i, v) }.toSeq

  private def fetchVals(c: String, ids: Seq[Int]): Seq[Long] =
    ids.map(i => cols(c)(i).get.toLong)

  private def agg(op: String, vs: Seq[Long]): Long = op match {
    case "min"   => if (vs.isEmpty) Int.MaxValue else vs.min
    case "max"   => if (vs.isEmpty) Int.MinValue else vs.max
    case "sum"   => wrap32(vs.sum).toLong
    case "count" => vs.size.toLong
    case "avg"   =>
      // the reference's avg is agg_sum/agg_count where agg_sum is a
      // WRAPPING 32-bit int (aggregate.c:64-84): wrap first, then
      // truncating division — a Long-sum avg diverges once the raw sum
      // overflows 32 bits
      wrap32(vs.sum).toLong / vs.size // trunc; scripts avoid empty
  }

  private def math(op: String, l: Seq[Long], r: Seq[Long]): Seq[Long] = {
    require(l.size == r.size, "model: length mismatch")
    l.lazyZip(r).map { (a, b) =>
      wrap32(op match {
        case "add" => a + b
        case "sub" => a - b
        case "mul" => a * b
        case "div" => a / b // trunc toward zero; scripts keep b nonzero
      }).toLong
    }
  }

  private val CreateP = """create\((\w+),"([^"]+)"\)""".r
  private val LoadP = """load\("([^"]+)"\)""".r
  private val SelAllP = """(?:(\w+)=)?select\((\w+)\)""".r
  // select bounds are UNSIGNED, like the reference parser (parser.c %u)
  private val SelOneP = """(?:(\w+)=)?select\((\w+),(\d+)\)""".r
  private val SelRngP = """(?:(\w+)=)?select\((\w+),(\d+),(\d+)\)""".r
  private val FetchP = """(?:(\w+)=)?fetch\((\w+),(\w+)\)""".r
  private val JoinP = """(\w+),(\w+)=(hash|sort|loop|tree)join\((\w+),(\w+)\)""".r
  private val AggP = """(?:(\w+)=)?(min|max|sum|avg|count)\((\w+)\)""".r
  private val MathP = """(?:(\w+)=)?(add|sub|mul|div)\((\w+),(\w+)\)""".r
  private val InsertP = """insert\(([^)]+)\)""".r
  private val DeleteP = """delete\((\w+),([\w,]+)\)""".r
  private val UpdateP = """update\((\w+),(\w+),(-?\d+)\)""".r
  private val TupleP = """tuple\(([\w,]+)\)""".r
  private val PrintP = """print\((\w+)\)""".r

  private def emitOrBind(assign: String, v: Value): Seq[String] =
    if (assign != null) { env(assign) = v; Seq.empty } else emit(v)

  private def emit(v: Value): Seq[String] = v match {
    case Ids(ids) => ids.map(_.toString)
    case Vals(vs) => vs.map(_.toString)
  }

  /** Evaluate one line; returns the client-visible output lines. */
  def eval(line: String): Seq[String] = line.trim match {
    case "" => Seq.empty
    case t if t.startsWith("#") => Seq.empty
    case CreateP(c, _) => cols.getOrElseUpdate(c, ArrayBuffer()); Seq.empty
    case LoadP(f) =>
      val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(f))
      val names = lines.get(0).split(",").map(_.trim)
      (1 until lines.size()).foreach { i =>
        val vs = lines.get(i).split(",").map(_.trim.toInt)
        names.lazyZip(vs).foreach((n, v) => cols(n) += Some(v))
      }
      Seq.empty
    case SelRngP(a, c, lo, hi) =>
      emitOrBind(a, Ids(live(c).collect {
        case (i, v) if v >= lo.toLong && v <= hi.toLong => i }))
    case SelOneP(a, c, x) =>
      emitOrBind(a, Ids(live(c).collect { case (i, v) if v == x.toInt => i }))
    case SelAllP(a, c) => emitOrBind(a, Ids(live(c).map(_._1)))
    case FetchP(a, c, p) =>
      val Ids(ids) = env(p): @unchecked
      emitOrBind(a, Vals(fetchVals(c, ids)))
    case JoinP(vl, vr, _, inL, inR) =>
      // all four join keywords: the same value-match pair multiset
      val Vals(l) = env(inL): @unchecked
      val Vals(r) = env(inR): @unchecked
      val lIds = lastIdsOf(inL); val rIds = lastIdsOf(inR)
      val pairs = for (li <- l.indices; ri <- r.indices if l(li) == r(ri))
        yield (lIds(li), rIds(ri))
      env(vl) = Ids(pairs.map(_._1))
      env(vr) = Ids(pairs.map(_._2))
      Seq.empty
    case AggP(a, op, in) =>
      val Vals(vs) = env(in): @unchecked
      emitOrBind(a, Vals(Seq(agg(op, vs))))
    case MathP(a, op, l, r) =>
      val Vals(lv) = env(l): @unchecked
      val Vals(rv) = env(r): @unchecked
      emitOrBind(a, Vals(math(op, lv, rv)))
    case InsertP(body) =>
      val parts = body.split(",").map(_.trim)
      parts.grouped(2).foreach { case Array(c, v) => cols(c) += Some(v.toInt) }
      Seq.empty
    case DeleteP(p, cs) =>
      val Ids(ids) = env(p): @unchecked
      for (c <- cs.split(","); i <- ids.distinct) cols(c.trim)(i) = None
      Seq.empty
    case UpdateP(p, c, v) =>
      val Ids(ids) = env(p): @unchecked
      ids.distinct.foreach(i => cols(c)(i) = Some(v.toInt))
      Seq.empty
    case TupleP(vars) =>
      val seqs = vars.split(",").map(v => (env(v.trim): @unchecked) match {
        case Vals(vs) => vs
      })
      require(seqs.map(_.size).distinct.size == 1, "model: tuple length mismatch")
      seqs.head.indices.map(i => seqs.map(_(i)).mkString("(", ",", ")"))
    case PrintP(v) => emit(env(v))
    case other => sys.error(s"model cannot parse: $other")
  }

  /** Fetch results remember the id list they came from so a join can
    * bind pair POSITIONS, not just values (the engine's Vals carry ids
    * the same way, Intermediate.scala).
    */
  private val fetchSource = mutable.Map[String, Seq[Int]]()
  private def lastIdsOf(v: String): Seq[Int] = fetchSource(v)

  // wrap eval to record fetch id-lineage (kept out of the main match
  // for clarity)
  def run(line: String): Seq[String] = {
    val t = line.trim
    t match {
      case FetchP(a, _, p) if a != null =>
        val Ids(ids) = env(p): @unchecked
        fetchSource(a) = ids
      case _ => ()
    }
    eval(t)
  }

  def runScript(script: String): Seq[String] =
    script.linesIterator.flatMap(run).toSeq
}

private object PnModel {
  sealed trait Value
  final case class Ids(ids: Seq[Int]) extends Value
  final case class Vals(vs: Seq[Long]) extends Value
}
