package graft

import graft.core.Engine
import graft.tools.Cli

/** Error-path goldens for the CLI surface: the reference client/server
  * treat every operator error as PER-LINE state — the server renders the
  * DBE* error and stays in its request loop (server.c:856-859), the
  * client prints it and keeps reading (client.c:88-104). These specs pin
  * that contract end-to-end through [[Cli.runScript]]: exact error text,
  * exact stdout, and — the part a naive implementation gets wrong — that
  * lines AFTER an error still execute against the same session.
  */
class CliSpec extends SparkSpec {

  private def run(script: String, engine: Engine)
      : (Boolean, Seq[String], Seq[String]) = {
    val out = collection.mutable.Buffer[String]()
    val err = collection.mutable.Buffer[String]()
    val failed = Cli.runScript(engine.newSession(), script.linesIterator,
      out += _, err += _)
    (failed, out.toSeq, err.toSeq)
  }

  test("every DBE* error is one stderr line and the session continues") {
    val engine = new Engine(spark, tmpDir("cli_err_db"))
    val script =
      """create(ta,"unsorted")
        |create(tb,"unsorted")
        |create(ta,"sorted")
        |insert(ta,7,tb,0)
        |insert(ta,8,tb,2)
        |garbage(((
        |a=select(ta)
        |z=select(nope)
        |af=fetch(ta,a)
        |bf=fetch(tb,a)
        |q=div(af,bf)
        |mx=max(af)
        |tuple(mx,undefinedvar)
        |print(mx)
        |""".stripMargin
    val (failed, out, err) = run(script, engine)
    assert(failed)
    // exact reference-vocabulary error text, one line per failed op,
    // in script order
    assert(err == Seq(
      "DBECOLEXISTS: column ta (as unsorted; re-create requested sorted) already exists",
      "DBEPARSE: cannot parse: garbage(((",
      "DBECOLSELECT: no such column nope",
      "DBEDIVZERO: division by zero",
      "DBENOVAR: no such variable undefinedvar"))
    // the lines between and after the failures all ran: the duplicate
    // create didn't clobber ta, the failed div didn't kill the session,
    // and the final print sees state built before AND after errors
    assert(out == Seq("8"))
  }

  test("a failed mutation leaves the session usable and later mutations apply") {
    val engine = new Engine(spark, tmpDir("cli_mut_db"))
    val script =
      """create(ua,"unsorted")
        |insert(ua,5)
        |insert(ua,5,ua,6)
        |insert(ua,9)
        |c=count(ua_all)
        |ua_all=select(ua)
        |uf=fetch(ua,ua_all)
        |c=count(uf)
        |print(c)
        |""".stripMargin
    val (failed, out, err) = run(script, engine)
    assert(failed)
    assert(err == Seq(
      "DBEDUPCOL: duplicate column ua in insert",
      "DBENOVAR: no such variable ua_all"))
    // the duplicate-column insert inserted NOTHING (atomic failure) and
    // the out-of-order count failed cleanly; the rows from the two good
    // inserts are both present
    assert(out == Seq("2"))
  }

  test("a clean script runs error-free with exit-ok semantics") {
    val engine = new Engine(spark, tmpDir("cli_ok_db"))
    val script =
      """create(va,"unsorted")
        |insert(va,3)
        |insert(va,4)
        |v=select(va)
        |vf=fetch(va,v)
        |s=sum(vf)
        |print(s)
        |""".stripMargin
    val (failed, out, err) = run(script, engine)
    assert(!failed)
    assert(err.isEmpty)
    assert(out == Seq("7"))
  }
}
