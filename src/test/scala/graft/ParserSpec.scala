package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.lang.{Op, Parser}
import graft.lang.Op._

/** Parser round-trip tests, mirroring the reference's parse_test.c
  * (one case per grammar form, field + opString round-trip asserts).
  */
class ParserSpec extends AnyFunSuite {

  def ok(line: String, expect: Op): Unit = {
    val got = Parser.parseLine(line)
    assert(got.contains(expect), s"parsing <$line>")
    assert(got.get.opString == line, s"round-trip <$line>")
  }

  test("select forms") {
    ok("select(ra)", SelectAll(None, "ra"))
    ok("foo=select(ra)", SelectAll(Some("foo"), "ra"))
    ok("select(ra,5)", SelectValue(None, "ra", 5))
    ok("foo=select(ra,5)", SelectValue(Some("foo"), "ra", 5))
    ok("select(ra,1,9)", SelectRange(None, "ra", 1, 9))
    ok("foo=select(ra,1,9)", SelectRange(Some("foo"), "ra", 1, 9))
    // select bounds parse unsigned, full int32 range (parser.c %u)
    ok("v=select(ub,0,2147483647)", SelectRange(Some("v"), "ub", 0, 2147483647L))
  }

  test("fetch forms") {
    ok("fetch(ra,pos)", Fetch(None, "ra", "pos"))
    ok("vals=fetch(ra,pos)", Fetch(Some("vals"), "ra", "pos"))
  }

  test("create/load") {
    ok("""create(ra,"unsorted")""", Create("ra", Unsorted))
    ok("""create(rb,"sorted")""", Create("rb", Sorted))
    ok("""create(rc,"b+tree")""", Create("rc", BTree))
    ok("""load("/tmp/r.csv")""", Load("/tmp/r.csv"))
    assert(Parser.parseLine("""create(ra,"wat")""").isEmpty)
  }

  test("joins") {
    for (j <- JoinType.all)
      ok(s"a,b=${j.keyword}(x,y)", Join(j, "a", "b", "x", "y"))
  }

  test("aggregates") {
    for (a <- AggType.all) {
      ok(s"${a.keyword}(x)", Agg(a, None, "x"))
      ok(s"out=${a.keyword}(x)", Agg(a, Some("out"), "x"))
    }
  }

  test("math") {
    for (m <- MathType.all) {
      ok(s"${m.keyword}(x,y)", Op.Math(m, None, "x", "y"))
      ok(s"out=${m.keyword}(x,y)", Op.Math(m, Some("out"), "x", "y"))
    }
  }

  test("mutations") {
    ok("insert(ra,5,rb,-3)", Insert(Seq("ra" -> 5, "rb" -> -3)))
    ok("delete(pos,ra,rb)", Delete("pos", Seq("ra", "rb")))
    ok("update(pos,ra,42)", Update("pos", "ra", 42))
    assert(Parser.parseLine("insert(ra,5,rb)").isEmpty) // odd arity
  }

  test("emission") {
    ok("tuple(a,b,c)", Op.Tuple(Seq("a", "b", "c")))
    ok("print(a)", Print("a"))
  }

  test("garbage rejected (round-trip check, parser.c:395-401)") {
    assert(Parser.parseLine("select(ra,1,9)trailing").isEmpty)
    assert(Parser.parseLine("frobnicate(x)").isEmpty)
    assert(Parser.parseLine("").isEmpty)
  }

  test("script parse") {
    val s = "create(ra,\"unsorted\")\n# comment\nfoo=select(ra,1,9)\n"
    assert(Parser.parseScript(s).toOption.get.size == 2)
    assert(Parser.parseScript("bogus(1)").isLeft)
  }
}
