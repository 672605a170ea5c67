package graft

import org.apache.spark.sql.DataFrame

import graft.engine.{MiniSqlEngine, MiniSql}
import graft.engine.MiniSql.MiniSqlError
import graft.sources.CsvCatalog

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Golden parity suite: the 15 official queries from
  * /root/reference/TestCases/test.txt plus the survey's probe queries,
  * executed against the reference's own fixture CSVs (read in place —
  * nothing copied). Expected values are computed from the fixture files
  * by a naive in-memory model, so the assertions hold for any fixture
  * content. Divergences from reference bugs (SURVEY.md §2.12) are
  * asserted as the REBUILD's semantics, marked `≠ref`. */
class MiniSqlSpec extends SparkSpec {

  private val fixtureDir = "/root/reference/TestCases"

  private lazy val engine = new MiniSqlEngine(CsvCatalog.load(spark, fixtureDir))

  /** naive model: table → rows of col → value (metadata + csv re-parse) */
  private lazy val model: Map[String, (Seq[String], Vector[Vector[Long]])] = {
    val defs = CsvCatalog.parseMetadata(
      Files.readAllLines(Paths.get(fixtureDir, "metadata.txt")).asScala.toSeq)
    defs.map { td =>
      val rows = Files.readAllLines(Paths.get(fixtureDir, s"${td.name}.csv"))
        .asScala.filter(_.trim.nonEmpty)
        .map(_.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"").toLong).toVector)
        .toVector
      td.name -> (td.columns, rows)
    }.toMap
  }
  private def colVals(table: String, c: String): Vector[Long] = {
    val (cols, rows) = model(table)
    val i = cols.indexOf(c)
    rows.map(_(i))
  }

  private def rows(df: DataFrame): Vector[Vector[Any]] =
    df.collect().map(_.toSeq.toVector).toVector

  test("q1: select * from table1 — full scan, file order, headers") {
    val df = engine.execute("select * from table1")
    assert(df.columns.toSeq == Seq("TABLE1.A", "TABLE1.B", "TABLE1.C"))
    assert(rows(df) == model("table1")._2.map(_.map(x => x: Any)))
  }

  test("q2-q5: whole-column aggregates match the naive model") {
    assert(rows(engine.execute("select max(A) from table1")) ==
      Vector(Vector(colVals("table1", "A").max)))
    assert(rows(engine.execute("select min(B) from table1")) ==
      Vector(Vector(colVals("table1", "B").min)))
    val c = colVals("table1", "C")
    assert(rows(engine.execute("select avg(C) from table1")) ==
      Vector(Vector(c.sum.toDouble / c.size)))
    assert(rows(engine.execute("select sum(D) from table2")) ==
      Vector(Vector(colVals("table2", "D").sum)))
  }

  test("q2 header naming: MAX(TABLE1.A)") {
    assert(engine.execute("select max(A) from table1").columns.toSeq ==
      Seq("MAX(TABLE1.A)"))
  }

  test("q6: single-column projection preserves file order") {
    assert(rows(engine.execute("select A from table1")).flatten ==
      colVals("table1", "A"))
  }

  test("q7: cross join is the left-major cartesian product") {
    val a = colVals("table1", "A")
    val dd = colVals("table2", "D")
    val expect = for (x <- a; y <- dd) yield Vector[Any](x, y)
    assert(rows(engine.execute("select A, D from table1, table2")) == expect)
  }

  test("q8: distinct(C) keeps first-occurrence order (sqlengine.py:664)") {
    assert(rows(engine.execute("select distinct(C) from table3")).flatten ==
      colVals("table3", "C").distinct)
  }

  test("q9-q11: constant and OR filters") {
    val (cols1, r1) = model("table1")
    def sel(p: Vector[Long] => Boolean, out: Seq[String]) =
      r1.filter(p).map(r => out.map(c => r(cols1.indexOf(c)): Any).toVector)
    assert(rows(engine.execute("select B, C from table1 where A = -900")) ==
      sel(r => r(0) == -900, Seq("B", "C")))
    assert(rows(engine.execute("select A, B from table1 where A = 775 or B = 803")) ==
      sel(r => r(0) == 775 || r(1) == 803, Seq("A", "B")))
    assert(rows(engine.execute("select A, B from table1 where A = 922 or B = 158;")) ==
      sel(r => r(0) == 922 || r(1) == 158, Seq("A", "B")))
  }

  test("q12: star join prints the join column once, LHS kept") {
    val df = engine.execute("select * from table1, table2 where table1.B = table2.B")
    assert(df.columns.toSeq == Seq("TABLE1.A", "TABLE1.B", "TABLE1.C", "TABLE2.D"))
    // aligned equi-join of the naive model, file order
    val (_, r1) = model("table1")
    val (_, r2) = model("table2")
    val expect = for (x <- r1; y <- r2 if x(1) == y(0))
      yield Vector[Any](x(0), x(1), x(2), y(1))
    assert(rows(df) == expect)
  }

  test("q13: projected equi-join aligns rows") {
    val (_, r1) = model("table1")
    val (_, r2) = model("table2")
    val expect = for (x <- r1; y <- r2 if x(1) == y(0)) yield Vector[Any](x(0), y(1))
    assert(rows(engine.execute("select A, D from table1, table2 where table1.B = table2.B")) == expect)
  }

  test("q14-q15: error classes match the reference taxonomy") {
    assert(intercept[MiniSqlError] { engine.execute("select A from table4") }
      .message.contains("TABLE4 doesn't exist"))
    assert(intercept[MiniSqlError] { engine.execute("select Z from table1") }
      .message.contains("Column Z not found"))
    assert(intercept[MiniSqlError] {
      engine.execute("select B from table1, table2 where table1.B = table2.B")
    }.message.contains("Ambiguous column query B"))
  }

  test("probes: real comparison operators (≠ref: reference executes all as '=')") {
    val a = colVals("table1", "A")
    assert(rows(engine.execute("select A from table1 where A != 922")).flatten ==
      a.filter(_ != 922))
    assert(rows(engine.execute("select A from table1 where A > 0")).flatten ==
      a.filter(_ > 0))
    assert(rows(engine.execute("select A from table1 where A le 500")).flatten ==
      a.filter(_ <= 500)) // word operator form
  }

  test("probes: count / filtered avg / empty-set min (≠ref bugs 3-4)") {
    assert(rows(engine.execute("select count(A) from table1")) ==
      Vector(Vector(model("table1")._2.size.toLong)))
    val (cols1, r1) = model("table1")
    val b158 = r1.filter(_(1) == 158).map(_(0))
    assert(rows(engine.execute("select avg(A) from table1 where B = 158")) ==
      Vector(Vector(b158.sum.toDouble / b158.size)))
    // empty match → SQL null, not sys.maxint
    assert(rows(engine.execute("select min(A) from table1 where B = 999999")) ==
      Vector(Vector(null)))
  }

  test("probes: >2 conditions accepted (≠ref: 'Too many conditions')") {
    val (_, r1) = model("table1")
    val expect = r1.filter(r => r(0) > 0 && r(1) > 0 && r(2) > 0).map(r => Vector[Any](r(0)))
    assert(rows(engine.execute("select A from table1 where A > 0 and B > 0 and C > 0")) == expect)
  }

  test("probes: commutative reversed condition (≠ref: error + unfiltered dump)") {
    val (_, r1) = model("table1")
    val expect = r1.filter(_(0) == 775).map(r => Vector[Any](r(0)))
    assert(rows(engine.execute("select A from table1 where 775 = A")) == expect)
  }

  test("probes: mixed aggregate + plain column rejected (≠ref bug 7)") {
    assert(intercept[MiniSqlError] { engine.execute("select A, max(B) from table1") }
      .message.toLowerCase.contains("group by"))
  }

  test("probes: filter × cross join (value filter with 2 FROM tables)") {
    val (_, r1) = model("table1")
    val dd = colVals("table2", "D")
    val expect = for (x <- r1.filter(_(0) == 775); y <- dd) yield Vector[Any](x(0), y)
    assert(rows(engine.execute("select A, D from table1, table2 where A = 775")) == expect)
  }

  test("probes: IN / NOT IN lists execute (≠ref: parse-only, exec rejects)") {
    val a = colVals("table1", "A")
    assert(rows(engine.execute("select A from table1 where A in (922, 775, 5)")).flatten ==
      a.filter(Set(922L, 775L, 5L)))
    assert(rows(engine.execute("select A from table1 where A not in (922, 775)")).flatten ==
      a.filterNot(Set(922L, 775L)))
  }

  test("extension: ORDER BY / LIMIT (absent in the reference grammar)") {
    val a = colVals("table1", "A")
    assert(rows(engine.execute("select A from table1 order by A desc")).flatten ==
      a.sorted.reverse)
    assert(rows(engine.execute("select A from table1 order by A limit 3")).flatten ==
      a.sorted.take(3))
    assert(rows(engine.execute("select A from table1 limit 2")).flatten ==
      a.take(2)) // bare LIMIT keeps file order
    assert(intercept[MiniSqlError] {
      engine.execute("select max(A) from table1 order by A")
    }.message.contains("plain projections"))
  }

  test("parser: comments, case-insensitivity, qualified projection") {
    assert(rows(engine.execute("SELECT table1.A FROM Table1 -- trailing comment")).flatten ==
      colVals("table1", "A"))
  }

  test("CLI: bad data path re-prompts instead of dying (ref sqlengine.py:76-87)") {
    val inputs = Iterator("/nope/still/bad", fixtureDir)
    assert(MiniSqlCli.resolveDataDir("/definitely/missing", () => inputs.next()) == fixtureDir)
    // blank input falls back to "." (no metadata.txt there → loops on)
    val inputs2 = Iterator("", fixtureDir)
    assert(MiniSqlCli.resolveDataDir("/missing", () => inputs2.next()) == fixtureDir)
    // EOF aborts cleanly instead of spinning forever
    intercept[IllegalArgumentException] {
      MiniSqlCli.resolveDataDir("/missing", () => null)
    }
    // a valid path never prompts
    assert(MiniSqlCli.resolveDataDir(fixtureDir,
      () => fail("prompted despite valid path")) == fixtureDir)
  }

  test("extension: GROUP BY maps to groupBy().agg() with FN(TABLE.COL) headers") {
    val df = engine.execute("select B, sum(A), count(A) from table1 group by B")
    assert(df.columns.toSeq ==
      Seq("TABLE1.B", "SUM(TABLE1.A)", "COUNT(TABLE1.A)"))
    val (cols, rws) = model("table1")
    val (ai, bi) = (cols.indexOf("A"), cols.indexOf("B"))
    val want = rws.groupBy(_(bi)).toVector
      .map { case (b, rs) => Vector[Any](b, rs.map(_(ai)).sum, rs.size.toLong) }
      .sortBy(_(0).asInstanceOf[Long]) // groups emit in key order
    assert(rows(df) == want)
  }

  test("extension: HAVING filters groups; aggregates shared with the SELECT list compute once") {
    val df = engine.execute(
      "select B, count(A) from table1 group by B having count(A) > 1 order by B desc")
    val (cols, rws) = model("table1")
    val (ai, bi) = (cols.indexOf("A"), cols.indexOf("B"))
    val want = rws.groupBy(_(bi)).toVector
      .map { case (b, rs) => (b, rs.map(_(ai)).size.toLong) }
      .filter(_._2 > 1)
      .sortBy(-_._1).map { case (b, n) => Vector[Any](b, n) }
    assert(rows(df) == want)
    // HAVING may also name an aggregate absent from the SELECT list
    val df2 = engine.execute(
      "select B from table1 group by B having max(A) >= min(A)")
    assert(df2.columns.toSeq == Seq("TABLE1.B"))
    assert(rows(df2).flatten.toSet == rws.map(_(bi)).toSet)
  }

  test("extension: ORDER BY on an aggregate (top-groups-first), GROUP BY only") {
    val df = engine.execute(
      "select B, sum(A) from table1 group by B order by sum(A) desc")
    val (cols, rws) = model("table1")
    val (ai, bi) = (cols.indexOf("A"), cols.indexOf("B"))
    val sums = rws.groupBy(_(bi)).map { case (b, rs) => (b, rs.map(_(ai)).sum) }
    assert(rows(df).map(_(1).asInstanceOf[Long]) ==
      sums.values.toVector.sortBy(-_))
    // the ordering aggregate need not be projected
    val df2 = engine.execute(
      "select B from table1 group by B order by count(A) desc, B asc")
    val want2 = sums.keys.toVector
      .map(b => (b, rws.count(_(bi) == b).toLong)).sortBy { case (b, n) => (-n, b) }
      .map(_._1)
    assert(rows(df2).flatten == want2)
    val e = intercept[MiniSqlError] {
      engine.execute("select A from table1 order by sum(A)")
    }
    assert(e.getMessage.contains("requires GROUP BY"))
  }

  test("extension: GROUP BY error classes (ANSI column rule, WHERE-aggregate, bare HAVING)") {
    val e1 = intercept[MiniSqlError] {
      engine.execute("select A, sum(B) from table1 group by B")
    }
    assert(e1.getMessage.contains("must appear in GROUP BY"))
    val e2 = intercept[MiniSqlError] {
      engine.execute("select B from table1 where sum(A) > 3 group by B")
    }
    assert(e2.getMessage.contains("HAVING"))
    val e3 = intercept[MiniSqlError] {
      engine.execute("select B from table1 having B > 1")
    }
    assert(e3.getMessage.contains("HAVING requires GROUP BY"))
    val e4 = intercept[MiniSqlError] {
      engine.execute("select * from table1 group by B")
    }
    assert(e4.getMessage.contains("cannot be combined with GROUP BY"))
  }

  test("extension: fileOrder=false skips the implicit row-id sort (parity-scale contract)") {
    val unordered = new MiniSqlEngine(CsvCatalog.load(spark, fixtureDir),
      fileOrder = false)
    val df = unordered.execute("select A, B from table1")
    // same multiset of rows…
    val (cols, rws) = model("table1")
    val (ai, bi) = (cols.indexOf("A"), cols.indexOf("B"))
    assert(rows(df).map(r => (r(0), r(1))).sortBy(_.toString) ==
      rws.map(r => (r(ai): Any, r(bi): Any)).sortBy(_.toString))
    // …with NO global sort in the plan (the big-table guard)
    assert(!df.queryExecution.optimizedPlan.toString.contains("Sort"),
      s"unordered dialect query must not plan a sort:\n${df.queryExecution.optimizedPlan}")
    // an explicit ORDER BY still sorts
    val sorted = unordered.execute("select A from table1 order by A desc")
    assert(rows(sorted).flatten == colVals("table1", "A").sortBy(-_))
  }

  test("CLI: malformed cells are counted per table (ref per-cell warning, sqlengine.py:146-147)") {
    val dir = Files.createTempDirectory("badcsv")
    Files.writeString(dir.resolve("metadata.txt"),
      "<begin_table>\nbad\nA\nB\n<end_table>\n<begin_table>\ngood\nX\n<end_table>\n")
    Files.writeString(dir.resolve("bad.csv"), "1,2\n3,oops\n\"5\",\"6\"\n")
    Files.writeString(dir.resolve("good.csv"), "7\n8\n")
    val counts = CsvCatalog.malformedCellCounts(CsvCatalog.load(spark, dir.toString))
    assert(counts("bad") == 1L)  // the one non-integer cell → NULL, warned
    assert(counts("good") == 0L) // clean table stays silent
  }
}
