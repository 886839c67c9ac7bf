package graft.config

import org.scalatest.funsuite.AnyFunSuite

class SyncConfigSpec extends AnyFunSuite {
  val yml =
    """# mirror of the reference's example.yml shape
      |src:
      |  host: 192.168.1.1
      |  port: 3306
      |  database: srcdb
      |  username: u1
      |  password: p1
      |dest:
      |  host: 192.168.1.2
      |  port: 3307
      |  database: destdb
      |  username: u2
      |  password: p2
      |pageSize: 100000
      |maxParallel: 30
      |batchRowSize: 1000
      |tables:
      |  tab1:
      |    - select * from tab1 where id <= 100
      |    - select * from tab1 where id > 100
      |  tab2:
      |    - "select * from tab2"
      |exclude: big_table log_table
      |""".stripMargin

  test("parses the reference yml surface") {
    val c = SyncConfig.fromYaml(yml)
    assert(c.src.url == "jdbc:mysql://192.168.1.1:3306/srcdb")
    assert(c.src.props == Map("user" -> "u1", "password" -> "p1"))
    assert(c.dest.url == "jdbc:mysql://192.168.1.2:3307/destdb")
    assert(c.pageSize == 100000 && c.maxParallel == 30 && c.batchRowSize == 1000)
    assert(c.tables("tab1").size == 2)
    assert(c.tables("tab2") == Seq("select * from tab2"))
    assert(c.exclude == Seq("big_table", "log_table"))
  }

  test("defaults mirror the reference's shipped defaults") {
    val c = SyncConfig.fromYaml("src:\n  host: a\ndest:\n  host: b\n")
    assert(c.pageSize == 100000 && c.maxParallel == 30 && c.batchRowSize == 1000)
    assert(c.tables.isEmpty && c.exclude.isEmpty)
  }

  test("'#' inside values survives; only whitespace-preceded '#' comments") {
    val c = SyncConfig.fromYaml(
      """src:
        |  url: "jdbc:mysql://h:3306/db#frag"
        |  password: 'p#ss word'   # trailing comment goes
        |dest:
        |  host: b
        |pageSize: "2000"
        |tables:
        |  t1:
        |    - select '#' AS h, c from t1  # comment
        |""".stripMargin)
    assert(c.src.url == "jdbc:mysql://h:3306/db#frag")
    assert(c.src.props("password") == "p#ss word")
    assert(c.pageSize == 2000) // quoted top-level scalar parses
    assert(c.tables("t1") == Seq("select '#' AS h, c from t1"))
  }

  test("mid-scalar apostrophes are literal, not quote openers") {
    val c = SyncConfig.fromYaml(
      """src:
        |  host: a
        |  password: don't  # comment must still strip
        |dest:
        |  host: b
        |tables:
        |  t1:
        |    - select c from t where s = 'it''s'  # strip me
        |""".stripMargin)
    assert(c.src.props("password") == "don't")
    assert(c.tables("t1") == Seq("select c from t where s = 'it''s'"))
  }

  test("doubled-quote escape inside a quoted scalar does not end it") {
    val c = SyncConfig.fromYaml(
      """src:
        |  host: a
        |  password: 'ab''c # d'   # this one strips
        |dest:
        |  host: b
        |""".stripMargin)
    assert(c.src.props("password") == "ab'c # d",
      c.src.props("password"))
  }

  test("quoted scalars inside flow collections keep their ' #'") {
    // prev non-space before the quote is '[' / ',' — the quote must
    // still open, so the ' #' inside stays part of the scalar and the
    // trailing comment is what strips
    val c = SyncConfig.fromYaml(
      """src:
        |  host: a
        |  password: ['a #b', 'c']  # strip me
        |dest:
        |  host: b
        |""".stripMargin)
    assert(c.src.props("password") == "['a #b', 'c']",
      c.src.props("password"))
  }

  test("watermarks section maps tables to incremental columns") {
    val c = SyncConfig.fromYaml(
      """src:
        |  host: a
        |dest:
        |  host: b
        |watermarks:
        |  orders: o_orderkey
        |  events: ts
        |""".stripMargin)
    assert(c.watermarks == Map("orders" -> "o_orderkey", "events" -> "ts"))
  }

  test("rejects nonsense knobs") {
    intercept[IllegalArgumentException] {
      SyncConfig(graft.config.Endpoint("x"), Endpoint("y"), pageSize = 0)
    }
  }
}
