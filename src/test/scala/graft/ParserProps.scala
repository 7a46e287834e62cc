package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.lang.{Op, Parser}
import graft.lang.Op._

/** Property-based parser validation: for ANY well-formed op, the canonical
  * opString re-parses to an equal Op (the reference validates every parse
  * the same way, parser.c:395-401 — here quantified over generated ops
  * rather than a fixed case list).
  */
object ParserProps extends Properties("Parser") {

  private val keywords = Set("select", "fetch", "create", "load", "insert",
    "delete", "update", "tuple", "print") ++
    JoinType.all.map(_.keyword) ++ AggType.all.map(_.keyword) ++
    MathType.all.map(_.keyword)

  val ident: Gen[String] = for {
    h <- Gen.alphaLowerChar
    n <- Gen.choose(0, 8) // cover 1-char names and keyword prefixes/extensions
    t <- Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
    s = (h :: t).mkString if !keywords(s)
  } yield s

  val bound: Gen[Long] = Gen.chooseNum(0L, Int.MaxValue.toLong)
  val intVal: Gen[Int] = Gen.chooseNum(Int.MinValue, Int.MaxValue)
  val maybeAssign: Gen[Option[String]] = Gen.option(ident)

  val genOp: Gen[Op] = Gen.oneOf(
    for { a <- maybeAssign; c <- ident } yield SelectAll(a, c),
    for { a <- maybeAssign; c <- ident; x <- bound } yield SelectValue(a, c, x),
    for { a <- maybeAssign; c <- ident; l <- bound; h <- bound }
      yield SelectRange(a, c, l, h),
    for { a <- maybeAssign; c <- ident; p <- ident } yield Fetch(a, c, p),
    for { c <- ident; s <- Gen.oneOf(StorageType.all) } yield Create(c, s),
    Gen.const(Load("/tmp/x.csv")),
    for {
      j <- Gen.oneOf(JoinType.all); vl <- ident; vr <- ident
      il <- ident; ir <- ident
    } yield Join(j, vl, vr, il, ir),
    for { t <- Gen.oneOf(AggType.all); a <- maybeAssign; in <- ident }
      yield Agg(t, a, in),
    for { m <- Gen.oneOf(MathType.all); a <- maybeAssign; x <- ident; y <- ident }
      yield Op.Math(m, a, x, y),
    for {
      n <- Gen.chooseNum(1, 4)
      cs <- Gen.listOfN(n, ident); vs <- Gen.listOfN(n, intVal)
      if cs.distinct.size == n
    } yield Insert(cs.zip(vs)),
    for { p <- ident; n <- Gen.chooseNum(1, 4); cs <- Gen.listOfN(n, ident) }
      yield Delete(p, cs),
    for { p <- ident; c <- ident; v <- intVal } yield Update(p, c, v),
    for { n <- Gen.chooseNum(1, 5); vs <- Gen.listOfN(n, ident) }
      yield Op.Tuple(vs),
    ident.map(Print.apply),
  )

  property("opString round-trips") = Prop.forAll(genOp) { op =>
    Parser.parseLine(op.opString).contains(op)
  }

  property("whitespace-padded lines still parse") = Prop.forAll(genOp) { op =>
    Parser.parseLine("  " + op.opString + "  ").contains(op)
  }

  property("trailing garbage rejected") = Prop.forAll(genOp) { op =>
    Parser.parseLine(op.opString + ")x").isEmpty
  }
}
