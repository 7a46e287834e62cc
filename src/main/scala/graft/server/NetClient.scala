package graft.server

import java.io.{BufferedReader, BufferedWriter, IOException, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** Socket client for [[TcpServer]] — the reference's client
  * (/root/reference/src/client/client.c) against our wire protocol.
  *
  * Sends one operator line at a time and drains that line's response
  * before sending the next (the reference's request/response lockstep,
  * client.c:295-342): data lines (prefix '|') go to `out` stripped of the
  * prefix — so end-user output is byte-identical to the in-process CLI —
  * and `-ERR` statuses go to `err`. Blank lines and `#` comments are
  * consumed client-side, like the batch client. Returns true iff any line
  * failed; errors are per-line and the session continues (client.c:88-104).
  */
object NetClient {

  def run(host: String, port: Int, lines: Iterator[String],
          out: String => Unit, err: String => Unit): Boolean = {
    val sock = new Socket(host, port)
    try {
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
      val w = new BufferedWriter(new OutputStreamWriter(sock.getOutputStream, UTF_8))
      var failed = false
      var quit = false
      val it = lines.iterator
      while (!quit && it.hasNext) {
        val t = it.next().trim
        // a user-authored `quit` ends the session exactly like the
        // client's own shutdown: the server sends NO status for it, so
        // waiting for one would misreport a clean exit as an error
        if (t == "quit") quit = true
        else if (t.nonEmpty && !t.startsWith("#")) {
          w.write(t); w.newLine(); w.flush()
          var done = false
          while (!done) {
            val resp = in.readLine()
            if (resp == null)
              throw new IOException("connection closed by server mid-response")
            if (resp.startsWith("|")) out(resp.substring(1))
            else if (resp == "+OK") done = true
            else if (resp.startsWith("-ERR ")) {
              failed = true; err(resp.substring(5)); done = true
            } else throw new IOException(s"malformed response line: $resp")
          }
        }
      }
      // polite shutdown: the server ends the session on `quit` or EOF
      w.write("quit"); w.newLine(); w.flush()
      failed
    } finally {
      try sock.close() catch { case _: IOException => () }
    }
  }

  /** Usage: NetClient <host> <port> [scriptFile | --interactive]
    * (neither -> stdin). Mirrors [[graft.tools.Cli]]'s surface with the
    * engine behind a socket instead of in-process.
    */
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: NetClient <host> <port> [scriptFile | --interactive]")
      sys.exit(2)
    }
    val (host, port) = (args(0), args(1).toInt)
    val interactive = args.contains("--interactive") || args.contains("-i")
    var failed = false
    try {
      if (interactive) {
        // one connection for the whole REPL: the session env persists
        // across prompts, like the reference's interactive client
        val sock = new Socket(host, port)
        try {
          val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
          val w = new BufferedWriter(new OutputStreamWriter(sock.getOutputStream, UTF_8))
          print("graft> "); Console.flush()
          val stdin = scala.io.Source.stdin.getLines()
          var quit = false
          while (!quit && stdin.hasNext) {
            val t = stdin.next().trim
            if (t == "quit") {
              // clean user exit — the server acknowledges with nothing
              w.write("quit"); w.newLine(); w.flush()
              quit = true
            } else if (t.nonEmpty && !t.startsWith("#")) {
              w.write(t); w.newLine(); w.flush()
              var done = false
              while (!done) {
                val resp = in.readLine()
                if (resp == null) { System.err.println("server closed"); sys.exit(1) }
                if (resp.startsWith("|")) println(resp.substring(1))
                else if (resp == "+OK") done = true
                else if (resp.startsWith("-ERR ")) {
                  failed = true; System.err.println(resp.substring(5)); done = true
                } else { System.err.println(s"malformed: $resp"); sys.exit(1) }
              }
            }
            if (!quit) { print("graft> "); Console.flush() }
          }
          println()
        } finally sock.close()
      } else {
        val script =
          if (args.length > 2) new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(args(2))))
          else scala.io.Source.stdin.mkString
        failed = run(host, port, script.linesIterator,
          println, System.err.println)
      }
    } catch {
      case e: IOException =>
        System.err.println(s"connection error: ${e.getMessage}")
        failed = true
    }
    if (failed) sys.exit(1)
  }
}
