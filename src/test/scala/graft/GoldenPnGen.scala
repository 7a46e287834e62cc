package graft

import java.nio.file.{Files, Paths}

/** Generates the vendored pN golden suites under
  * `src/test/resources/golden/pn/`: seeded CSVs, 13 operator scripts
  * spanning the p2/p3/p4 assignment surfaces
  * (/root/reference/assts/p2.txt §1, p3.txt §1-4, p4.txt §1) plus the
  * perftest template instantiated per join keyword
  * (/root/reference/perftests/templates/perftest.txt.template — the
  * shape whose MySQL twin is perftest.sql.template), and one
  * `.expected` per script computed by the independent [[PnModel]]
  * interpreter. [[GoldenPnSpec]] then byte-diffs engine output against
  * the FROZEN files — like the p3/p4 challenge fixtures, the model is
  * out of the test loop once the suite is committed.
  *
  * Scripts use a `{{DIR}}` placeholder for the CSV directory (resolved
  * to the resource dir at generation time here, to the classpath
  * location at test time). `p2_restart` carries a `# RESTART` marker
  * line: the spec closes the engine (or server) there and reopens it —
  * the p2 spec's persistence-across-restart requirement.
  *
  * Usage: `sbt "Test/runMain graft.GoldenPnGen"` (idempotent overwrite;
  * rerun only to regenerate the suite after a deliberate change, then
  * review the .expected diffs before committing).
  */
object GoldenPnGen {

  private val OutDir = "src/test/resources/golden/pn"

  /** Seeded CSVs: r/s carry the perftest generator's shape
    * (gen.py: ra/sa join keys in [0,400), rc 75% in the [1,9] range,
    * sf 75% in [31,99], rd negative, sg positive); w is a small
    * mixed-duplicate table for the p2/p4 scripts (wc strictly positive
    * so div chains never hit a zero divisor).
    */
  private def genCsvs(dir: String): Unit = {
    val rnd = new java.util.Random(16514)
    val r = new StringBuilder("ra,rc,rd\n")
    for (_ <- 1 to 4000) {
      val ra = rnd.nextInt(400)
      val rc = if (rnd.nextInt(4) < 3) 1 + rnd.nextInt(9) else 10 + rnd.nextInt(90)
      val rd = -rnd.nextInt(1 << 30)
      r ++= s"$ra,$rc,$rd\n"
    }
    val s = new StringBuilder("sa,sf,sg\n")
    for (_ <- 1 to 3000) {
      val sa = rnd.nextInt(400)
      val sf = if (rnd.nextInt(4) < 3) 31 + rnd.nextInt(69) else 100 + rnd.nextInt(900)
      val sg = rnd.nextInt(1 << 30)
      s ++= s"$sa,$sf,$sg\n"
    }
    val w = new StringBuilder("wa,wb,wc\n")
    for (_ <- 1 to 500) {
      val wa = rnd.nextInt(20)
      val wb = rnd.nextInt(2000) - 1000
      val wc = 1 + rnd.nextInt(49)
      w ++= s"$wa,$wb,$wc\n"
    }
    Files.writeString(Paths.get(dir, "r.csv"), r.toString)
    Files.writeString(Paths.get(dir, "s.csv"), s.toString)
    Files.writeString(Paths.get(dir, "w.csv"), w.toString)
  }

  /** The perftest template body (perftest.txt.template) for one join
    * keyword. treejoin needs its right input to be a FULL select of a
    * b+tree column (the engine's DBENOTREE precondition; the reference
    * perf runs use selrates=1.0 the same way — see tools.PerfBaseline).
    */
  private def perftestScript(join: String): String = {
    val sfSide =
      if (join == "tree") "sf_inter=select(sa)\njoin_input2=fetch(sa,sf_inter)"
      else "sf_inter=select(sf,31,99)\njoin_input2=fetch(sa,sf_inter)"
    s"""create(rc,"b+tree")
       |create(ra,"unsorted")
       |create(rd,"unsorted")
       |load("{{DIR}}/r.csv")
       |create(sf,"b+tree")
       |create(sa,"b+tree")
       |create(sg,"unsorted")
       |load("{{DIR}}/s.csv")
       |rc_inter=select(rc,1,9)
       |$sfSide
       |join_input1=fetch(ra,rc_inter)
       |count(join_input1)
       |count(join_input2)
       |r_results,s_results=${join}join(join_input1,join_input2)
       |rd_values=fetch(rd,r_results)
       |sg_values=fetch(sg,s_results)
       |maxr=max(rd_values)
       |mins=min(sg_values)
       |cr=count(rd_values)
       |cs=count(sg_values)
       |tuple(maxr,mins,cr,cs)
       |""".stripMargin
  }

  private def scripts: Seq[(String, String)] = Seq(
    // --- p2: selects over the three storage types, fetch, persistence ---
    "p2_scan_unsorted" ->
      """create(wa,"unsorted")
        |create(wb,"unsorted")
        |create(wc,"unsorted")
        |load("{{DIR}}/w.csv")
        |select(wa,5)
        |i=select(wa,3,12)
        |v=fetch(wb,i)
        |print(i)
        |print(v)
        |""".stripMargin,
    "p2_sorted_range" ->
      """create(wa,"unsorted")
        |create(wb,"sorted")
        |create(wc,"unsorted")
        |load("{{DIR}}/w.csv")
        |i=select(wb,0,250)
        |v=fetch(wc,i)
        |print(v)
        |j=select(wb,0,1000000)
        |jv=fetch(wb,j)
        |c=count(jv)
        |tuple(c)
        |""".stripMargin,
    "p2_btree_point" ->
      """create(wa,"unsorted")
        |create(wb,"unsorted")
        |create(wc,"b+tree")
        |load("{{DIR}}/w.csv")
        |i=select(wc,25)
        |v=fetch(wa,i)
        |print(i)
        |print(v)
        |""".stripMargin,
    "p2_restart" ->
      """create(wa,"unsorted")
        |create(wb,"sorted")
        |create(wc,"b+tree")
        |load("{{DIR}}/w.csv")
        |# RESTART
        |i=select(wc,10,14)
        |v=fetch(wb,i)
        |print(v)
        |s=sum(v)
        |print(s)
        |""".stripMargin,
    // --- p3: the perftest shape per join keyword, math, aggregates ---
    overflowScript,
    "p3_perftest_hash" -> perftestScript("hash"),
    "p3_perftest_sort" -> perftestScript("sort"),
    "p3_perftest_loop" -> perftestScript("loop"),
    "p3_perftest_tree" -> perftestScript("tree"),
    "p3_math_chain" ->
      """create(wa,"unsorted")
        |create(wb,"unsorted")
        |create(wc,"unsorted")
        |load("{{DIR}}/w.csv")
        |t1=select(wa,3)
        |t2=fetch(wb,t1)
        |t3=fetch(wc,t1)
        |t4=add(t2,t3)
        |t5=sub(t4,t2)
        |t6=mul(t5,t2)
        |t7=div(t6,t3)
        |print(t4)
        |print(t7)
        |tuple(t2,t3)
        |""".stripMargin,
    "p3_aggs" ->
      """create(aa,"unsorted")
        |insert(aa,1)
        |insert(aa,2)
        |t1=select(aa)
        |t2=fetch(aa,t1)
        |t3=avg(t2)
        |tuple(t3)
        |create(wa,"unsorted")
        |create(wb,"unsorted")
        |create(wc,"unsorted")
        |load("{{DIR}}/w.csv")
        |i=select(wa,0,9)
        |v=fetch(wb,i)
        |mn=min(v)
        |mx=max(v)
        |sm=sum(v)
        |ct=count(v)
        |tuple(mn,mx,sm,ct)
        |sum(v)
        |""".stripMargin,
    // --- p4: multi-column insert, delete, update (spec §1 examples) ---
    "p4_insert_delete" ->
      """create(c,"unsorted")
        |create(d,"unsorted")
        |create(e,"unsorted")
        |create(f,"unsorted")
        |insert(c,0,d,0,e,9,f,5)
        |insert(c,7,d,3,e,8,f,3)
        |insert(c,7,d,3,e,8,f,3)
        |insert(c,9,d,9,e,9,f,9)
        |t1=select(c,7)
        |print(t1)
        |delete(t1,c,d,e,f)
        |t2=select(c)
        |print(t2)
        |v=fetch(d,t2)
        |print(v)
        |""".stripMargin,
    "p4_update" ->
      """create(c,"unsorted")
        |create(d,"unsorted")
        |create(e,"unsorted")
        |create(f,"unsorted")
        |insert(c,0,d,0,e,9,f,5)
        |insert(c,7,d,3,e,8,f,3)
        |insert(c,7,d,3,e,8,f,3)
        |insert(c,9,d,9,e,9,f,9)
        |t1=select(e,9)
        |update(t1,c,1)
        |t2=select(c)
        |v=fetch(c,t2)
        |print(v)
        |""".stripMargin,
    "p4_mutation_mix" ->
      """create(wa,"unsorted")
        |create(wb,"unsorted")
        |create(wc,"unsorted")
        |load("{{DIR}}/w.csv")
        |insert(wa,100,wb,200,wc,7)
        |insert(wa,100,wb,300,wc,7)
        |t1=select(wa,100)
        |v1=fetch(wb,t1)
        |print(v1)
        |d=select(wa,0,4)
        |delete(d,wa,wb,wc)
        |t2=select(wa)
        |v2a=fetch(wc,t2)
        |c2=count(v2a)
        |tuple(c2)
        |u=select(wc,7)
        |update(u,wb,-1)
        |v2=fetch(wb,u)
        |s2=sum(v2)
        |mx2=max(v2)
        |tuple(s2,mx2)
        |""".stripMargin)

  /** 32-bit overflow parity across the whole agg/math surface — the
    * reference computes in C `int`: sum wraps, avg divides the WRAPPED
    * sum (aggregate.c:64-84), mul/add wrap elementwise. A Long-sum
    * engine or model passes every in-range script and silently
    * diverges here; this script pins all three sides (engine, model,
    * socket) to the wrapping semantics on exact overflow boundaries.
    */
  private def overflowScript: (String, String) = "p3_overflow" ->
    """create(oa,"unsorted")
      |insert(oa,2147483647)
      |insert(oa,2147483647)
      |insert(oa,2)
      |t1=select(oa)
      |t2=fetch(oa,t1)
      |s=sum(t2)
      |a=avg(t2)
      |tuple(s,a)
      |m=mul(t2,t2)
      |print(m)
      |ad=add(t2,t2)
      |print(ad)
      |""".stripMargin

  def main(args: Array[String]): Unit = {
    Files.createDirectories(Paths.get(OutDir))
    genCsvs(OutDir)
    val absDir = Paths.get(OutDir).toAbsolutePath.toString
    scripts.foreach { case (name, script) =>
      Files.writeString(Paths.get(OutDir, s"$name.txt"), script)
      val model = new PnModel
      val expected = script.replace("{{DIR}}", absDir)
        .linesIterator.flatMap(model.run).toSeq
      Files.writeString(Paths.get(OutDir, s"$name.expected"),
        expected.mkString("", "\n", "\n"))
      println(f"$name%-20s ${expected.size}%5d expected lines")
    }
  }
}
