package graft

import java.io.{BufferedReader, PrintWriter, StringReader, StringWriter}

/** Drives the [[GraftCli]] REPL loop (the ballista-cli analog,
  * ballista-cli/src/main.rs) through scripted input — statement splitting,
  * execution, rendering, meta commands, and error recovery all through the
  * same function `main` binds to stdin. */
class CliSpec extends SparkSpec {

  private def run(script: String, maxRows: Int = 10): String = {
    val out = new StringWriter
    GraftCli.repl(new BufferedReader(new StringReader(script)),
      new PrintWriter(out), spark, maxRows = maxRows)
    out.toString
  }

  test("statement splitting respects quotes and multi-line input") {
    val (stmts, rest) = GraftCli.splitStatements(
      "select ';' as a;\nselect\n 1; select 2")
    assert(stmts == Seq("select ';' as a", "select\n 1"))
    assert(rest.trim == "select 2")
  }

  test("executes ;-terminated SQL and renders an aligned table") {
    val o = run(s"SELECT 1 AS one, 'x' AS tag;\n")
    assert(o.contains("| one | tag |"), o)
    assert(o.contains("| 1   | x   |"), o)
    assert(o.contains("1 row(s)"), o)
  }

  test("multi-line statements accumulate until the terminator") {
    val o = run("SELECT 41\n + 1\n AS v;\n")
    assert(o.contains("| 42"), o)
  }

  test("trailing statement without ; executes at EOF (pipe mode)") {
    val o = run("SELECT 7 AS seven")
    assert(o.contains("| 7"), o)
  }

  test("queries real tables end-to-end") {
    Tables.registerAll(spark, sfDir)
    val o = run("SELECT COUNT(*) AS n FROM nation;\n")
    assert(o.contains("| 25"), o)
  }

  test("\\d lists tables, \\timing toggles, \\? prints help, \\q quits") {
    Tables.registerAll(spark, sfDir)
    // maxRows wide enough that \d shows every view even when sibling
    // suites have filled the shared catalog; \q must work right after a
    // completed statement (whitespace-only pending)
    val o = run("\\d\n\\timing\n\\?\nSELECT 1 AS a;\n\\q\nSELECT 2 AS b;\n",
      maxRows = 500)
    assert(o.contains("nation"), o)
    assert(o.contains("timing on"), o)
    assert(o.contains("\\q            quit"), o)
    assert(o.contains("Elapsed"), o)
    assert(!o.contains("| b |"), "statements after \\q must not run:\n" + o)
  }

  test("\\explain prints the physical plan instead of executing") {
    Tables.registerAll(spark, sfDir)
    val o = run("\\explain\nSELECT n_regionkey, COUNT(*) FROM nation GROUP BY n_regionkey;\n")
    assert(o.contains("explain on"), o)
    assert(o.contains("HashAggregate"), o)
  }

  test("a bad statement reports the error and the loop continues") {
    val o = run("SELECT * FROM graft_no_such_table;\nSELECT 3 AS ok;\n")
    assert(o.contains("error:"), o)
    assert(o.contains("| 3"), o)
  }

  test("result sets are capped at maxRows with a truncation note") {
    Tables.registerAll(spark, sfDir)
    val o = run("SELECT o_orderkey FROM orders ORDER BY o_orderkey;\n")
    assert(o.contains("first 10 rows"), o)
  }
}
