package graft.lang

/** The operator language of the engine.
  *
  * The surface is the 18-form line language of the reference column store
  * (see /root/reference/src/common/include/operators.h:9-28 and the sscanf
  * grammar in /root/reference/src/common/parser.c:74-407): each line is one
  * operator, multi-operator queries compose through named session variables.
  *
  * [[Op.opString]] is the canonical re-serialization; [[Parser]] validates
  * every parse by round-tripping through it (the reference does the same,
  * parser.c:395-401).
  */
sealed trait Op {
  /** Canonical textual form — must re-parse to an equal Op. */
  def opString: String
}

object Op {
  /** Column storage declaration. "sorted"/"b+tree" become write-time layout
    * hints (sort-on-write -> parquet min/max pruning); access paths are
    * otherwise uniform (reference: operators.h:30-34).
    */
  sealed abstract class StorageType(val name: String)
  case object Unsorted extends StorageType("unsorted")
  case object Sorted   extends StorageType("sorted")
  case object BTree    extends StorageType("b+tree")
  object StorageType {
    val all = Seq(Unsorted, Sorted, BTree)
    def fromString(s: String): Option[StorageType] = all.find(_.name == s)
  }

  sealed abstract class JoinType(val keyword: String)
  case object LoopJoin extends JoinType("loopjoin")
  case object SortJoin extends JoinType("sortjoin")
  case object HashJoin extends JoinType("hashjoin")
  case object TreeJoin extends JoinType("treejoin")
  object JoinType { val all = Seq(LoopJoin, SortJoin, HashJoin, TreeJoin) }

  sealed abstract class AggType(val keyword: String)
  case object AggMin   extends AggType("min")
  case object AggMax   extends AggType("max")
  case object AggSum   extends AggType("sum")
  case object AggCount extends AggType("count")
  case object AggAvg   extends AggType("avg")
  object AggType { val all = Seq(AggMin, AggMax, AggSum, AggCount, AggAvg) }

  sealed abstract class MathType(val keyword: String)
  case object MathAdd extends MathType("add")
  case object MathSub extends MathType("sub")
  case object MathMul extends MathType("mul")
  case object MathDiv extends MathType("div")
  object MathType { val all = Seq(MathAdd, MathSub, MathMul, MathDiv) }

  // --- scans / sources ---
  final case class Create(col: String, stype: StorageType) extends Op {
    def opString = s"""create($col,"${stype.name}")"""
  }
  final case class Load(file: String) extends Op {
    def opString = s"""load("$file")"""
  }

  // --- selects (low/high inclusive; reference rewrites to half-open
  //     internally, storage.c:1026-1031 — semantics are [low, high]) ---
  final case class SelectAll(assign: Option[String], col: String) extends Op {
    def opString = assign.fold(s"select($col)")(v => s"$v=select($col)")
  }
  final case class SelectValue(assign: Option[String], col: String, value: Long) extends Op {
    def opString = assign.fold(s"select($col,$value)")(v => s"$v=select($col,$value)")
  }
  final case class SelectRange(assign: Option[String], col: String, low: Long, high: Long) extends Op {
    def opString = assign.fold(s"select($col,$low,$high)")(v => s"$v=select($col,$low,$high)")
  }

  // --- positional projection ---
  final case class Fetch(assign: Option[String], col: String, posVar: String) extends Op {
    def opString = assign.fold(s"fetch($col,$posVar)")(v => s"$v=fetch($col,$posVar)")
  }

  // --- joins: two aligned position lists out ---
  final case class Join(jtype: JoinType, varL: String, varR: String,
                        inputL: String, inputR: String) extends Op {
    def opString = s"$varL,$varR=${jtype.keyword}($inputL,$inputR)"
  }

  // --- aggregates (singleton result) ---
  final case class Agg(atype: AggType, assign: Option[String], input: String) extends Op {
    def opString = assign.fold(s"${atype.keyword}($input)")(v => s"$v=${atype.keyword}($input)")
  }

  // --- elementwise column math, ordinal-aligned ---
  final case class Math(mtype: MathType, assign: Option[String],
                        input1: String, input2: String) extends Op {
    def opString = assign.fold(s"${mtype.keyword}($input1,$input2)")(v => s"$v=${mtype.keyword}($input1,$input2)")
  }

  // --- mutations ---
  final case class Insert(colVals: Seq[(String, Int)]) extends Op {
    def opString = s"insert(${colVals.map { case (c, v) => s"$c,$v" }.mkString(",")})"
  }
  final case class Delete(posVar: String, cols: Seq[String]) extends Op {
    def opString = s"delete($posVar,${cols.mkString(",")})"
  }
  final case class Update(posVar: String, col: String, value: Int) extends Op {
    def opString = s"update($posVar,$col,$value)"
  }

  // --- emission ---
  final case class Tuple(vars: Seq[String]) extends Op {
    def opString = s"tuple(${vars.mkString(",")})"
  }
  final case class Print(varName: String) extends Op {
    def opString = s"print($varName)"
  }
}
