package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._
import graft.lang.Op._
import graft.operators.ColumnOps

/** Property: all four join keywords produce the SAME pair multiset for
  * any input — the reference implies this by sharing .expected files
  * across join types (SURVEY §5); here it is quantified over random
  * value columns with duplicates. Few cases (each spins Spark jobs), but
  * each case checks 4-way equality including M x N duplicate expansion.
  */
object JoinProps extends Properties("Joins") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark

  /** Small value arrays with deliberate duplicate pressure. */
  private val valuesGen: Gen[List[Int]] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0, 8)))

  private def vals(values: List[Int]): org.apache.spark.sql.DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    values.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
  }

  property("all four keywords yield one pair multiset") =
    Prop.forAll(valuesGen, valuesGen) { (ls, rs) =>
      val l = vals(ls).cache()
      val r = vals(rs).cache()
      val expected = (for {
        (lv, li) <- ls.zipWithIndex; (rv, ri) <- rs.zipWithIndex if lv == rv
      } yield (li.toLong, ri.toLong)).groupBy(identity).view.mapValues(_.size).toMap
      val results = JoinType.all.map { jt =>
        val (pairs, _) = ColumnOps.join(jt, l, r, Seq("id"), Seq("id"))
        jt.keyword -> pairs.select("lid", "rid").collect()
          .map(row => (row.getLong(0), row.getLong(1)))
          .groupBy(identity).view.mapValues(_.length).toMap
      }
      l.unpersist(false); r.unpersist(false) // shared session across cases
      results.forall { case (kw, got) => got == expected } :| results
        .collect { case (kw, got) if got != expected => s"$kw mismatched" }
        .mkString(",")
    }

  property("salted join (session knob) preserves the pair multiset") =
    Prop.forAll(valuesGen, valuesGen) { (ls, rs) =>
      val l = vals(ls)
      val r = vals(rs)
      val expected = (for {
        (lv, li) <- ls.zipWithIndex; (rv, ri) <- rs.zipWithIndex if lv == rv
      } yield (li.toLong, ri.toLong)).groupBy(identity).view.mapValues(_.size).toMap
      spark.conf.set(graft.operators.SkewJoin.BucketsKey, "4")
      try {
        val (pairs, _) = ColumnOps.join(HashJoin, l, r, Seq("id"), Seq("id"))
        val got = pairs.select("lid", "rid").collect()
          .map(row => (row.getLong(0), row.getLong(1)))
          .groupBy(identity).view.mapValues(_.length).toMap
        (got == expected) :| s"salted multiset diverged: $got vs $expected"
      } finally spark.conf.unset(graft.operators.SkewJoin.BucketsKey)
    }
}
