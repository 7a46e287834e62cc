package graft.lang

/** Line parser for the operator language.
  *
  * One regex per grammar form, mirroring the reference's sscanf patterns
  * (/root/reference/src/common/parser.c:74-407), including its quirks:
  * forms are tried most-arguments-first ("because scanf is greedy"), and
  * every successful parse is validated by re-serializing via
  * [[Op.opString]] and comparing with the input line
  * (parser.c:395-401) — trailing garbage therefore rejects the line.
  */
object Parser {
  import Op._

  private val name = """([^=,()]+)"""   // variable / column names
  private val uint = """(\d+)"""        // select bounds parse unsigned (parser.c %u)
  private val int  = """(-?\d+)"""

  private val SelRangeA = s"$name=select\\($name,$uint,$uint\\)".r
  private val SelValueA = s"$name=select\\($name,$uint\\)".r
  private val SelAllA   = s"$name=select\\($name\\)".r
  private val SelRange  = s"select\\($name,$uint,$uint\\)".r
  private val SelValue  = s"select\\($name,$uint\\)".r
  private val SelAll    = s"select\\($name\\)".r
  private val FetchA    = s"$name=fetch\\($name,$name\\)".r
  private val FetchP    = s"fetch\\($name,$name\\)".r
  private val CreateP   = s"""create\\($name,"([^")]+)"\\)""".r
  private val LoadP     = """load\("([^")]+)"\)""".r
  private val InsertP   = """insert\(([^)]+)\)""".r
  private val DeleteP   = s"delete\\($name,([^)]+)\\)".r
  private val UpdateP   = s"update\\($name,$name,$int\\)".r
  private val TupleP    = """tuple\(([^)]+)\)""".r
  private val PrintP    = s"print\\($name\\)".r
  private val MathA     = s"$name=(add|sub|mul|div)\\($name,$name\\)".r
  private val MathP     = s"(add|sub|mul|div)\\($name,$name\\)".r
  private val AggA      = s"$name=(min|max|sum|count|avg)\\($name\\)".r
  private val AggP      = s"(min|max|sum|count|avg)\\($name\\)".r
  private val JoinP     = s"$name,$name=(loopjoin|sortjoin|hashjoin|treejoin)\\($name,$name\\)".r

  private val mathTypes = MathType.all.map(m => m.keyword -> m).toMap
  private val aggTypes  = AggType.all.map(a => a.keyword -> a).toMap
  private val joinTypes = JoinType.all.map(j => j.keyword -> j).toMap

  /** Parse one line (surrounding whitespace tolerated); None if it
    * matches no form (or fails round-trip).
    */
  def parseLine(rawLine: String): Option[Op] = {
    val line = rawLine.trim
    // numeric literals can overflow their regex (\d+ admits any length);
    // toLongOption/toIntOption turn that into a parse failure, never an
    // exception out of the parser
    val op: Option[Op] = line match {
      case SelRangeA(v, c, lo, hi) =>
        for (l <- lo.toLongOption; h <- hi.toLongOption)
          yield SelectRange(Some(v), c, l, h)
      case SelValueA(v, c, x)      => x.toLongOption.map(SelectValue(Some(v), c, _))
      case SelAllA(v, c)           => Some(SelectAll(Some(v), c))
      case SelRange(c, lo, hi)     =>
        for (l <- lo.toLongOption; h <- hi.toLongOption)
          yield SelectRange(None, c, l, h)
      case SelValue(c, x)          => x.toLongOption.map(SelectValue(None, c, _))
      case SelAll(c)               => Some(SelectAll(None, c))
      case FetchA(v, c, p)         => Some(Fetch(Some(v), c, p))
      case FetchP(c, p)            => Some(Fetch(None, c, p))
      case CreateP(c, st)          => StorageType.fromString(st).map(Create(c, _))
      case LoadP(f)                => Some(Load(f))
      case InsertP(body)           => parseInsertBody(body)
      case DeleteP(v, cols)        => Some(Delete(v, cols.split(",").toSeq))
      case UpdateP(v, c, x)        => x.toIntOption.map(Update(v, c, _))
      case TupleP(body)            => Some(Tuple(body.split(",").toSeq))
      case PrintP(v)               => Some(Print(v))
      case MathA(v, m, a, b)       => Some(Math(mathTypes(m), Some(v), a, b))
      case MathP(m, a, b)          => Some(Math(mathTypes(m), None, a, b))
      case AggA(v, a, c)           => Some(Agg(aggTypes(a), Some(v), c))
      case AggP(a, c)              => Some(Agg(aggTypes(a), None, c))
      case JoinP(vl, vr, j, il, ir) => Some(Join(joinTypes(j), vl, vr, il, ir))
      case _                       => None
    }
    // Round-trip validation, as the reference does (parser.c:395-401).
    op.filter(_.opString == line)
  }

  /** insert(c1,v1,c2,v2,...) — alternating column names and int values. */
  private def parseInsertBody(body: String): Option[Op] = {
    val parts = body.split(",")
    if (parts.length < 2 || parts.length % 2 != 0) None
    else {
      val pairs = parts.grouped(2).map { case Array(c, v) =>
        v.toIntOption.map(c -> _)
      }.toSeq
      if (pairs.exists(_.isEmpty)) None else Some(Insert(pairs.flatten))
    }
  }

  /** Parse a full script: non-empty lines (comments with # tolerated);
    * Left(badLine) on the first unparseable line.
    */
  def parseScript(script: String): Either[String, Seq[Op]] = {
    val lines = script.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#")).toSeq
    val parsed = lines.map(l => l -> parseLine(l))
    parsed.find(_._2.isEmpty) match {
      case Some((bad, _)) => Left(bad)
      case None           => Right(parsed.flatMap(_._2))
    }
  }
}
