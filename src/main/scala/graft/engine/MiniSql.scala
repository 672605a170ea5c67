package graft.engine

/** AST + recursive-descent parser for the reference's SQL dialect
  * (grammar at /root/reference/sqlengine.py:18-56): SELECT list of bare
  * or `t.col`-qualified columns, `*`, pseudo-functions `max/min/sum/avg/
  * average/count(col)` and `distinct(col)`, FROM list, WHERE with
  * comparison conditions joined by AND/OR.
  *
  * Deliberate divergences from the reference parser (SURVEY.md §7.1):
  *  - comparison operators are RETAINED (the reference discards them and
  *    always compares `==`, sqlengine.py:257-258);
  *  - any number of WHERE conditions (reference caps at 2,
  *    sqlengine.py:242-244);
  *  - parenthesized boolean expressions nest;
  *  - string literals are real literals (the reference misreads them as
  *    column names, sqlengine.py:43 + SURVEY §2.2).
  *
  * Hand-rolled because no parser library resolves offline; ~120 lines.
  */
object MiniSql {

  // ------------------------------- AST --------------------------------
  final case class ColRef(table: Option[String], name: String) {
    def display: String = (table.map(_.toUpperCase :+ '.').getOrElse("")) + name.toUpperCase
    override def toString: String = display
  }
  sealed trait Proj
  case object Star extends Proj
  final case class PlainCol(ref: ColRef) extends Proj
  final case class AggCol(fn: String, ref: ColRef) extends Proj
  final case class DistinctCol(ref: ColRef) extends Proj

  sealed trait Operand
  final case class ColOperand(ref: ColRef) extends Operand
  final case class NumLit(v: Long) extends Operand
  final case class StrLit(v: String) extends Operand
  /** An aggregate term inside a predicate — only legal in HAVING
    * (the engine rejects it in WHERE, mirroring ANSI). `fn` is
    * canonical (`average` already folded to `avg`). */
  final case class AggOperand(fn: String, ref: ColRef) extends Operand

  sealed trait Pred
  final case class Cmp(lhs: Operand, op: String, rhs: Operand) extends Pred
  /** `col [NOT] IN (v1, v2, …)` — the reference grammar admits IN but
    * its executor rejects it (sqlengine.py:48-50,251-253, SURVEY §2.2);
    * here it executes. */
  final case class InPred(lhs: Operand, values: Seq[Operand], negated: Boolean) extends Pred
  final case class AndPred(l: Pred, r: Pred) extends Pred
  final case class OrPred(l: Pred, r: Pred) extends Pred

  /** ORDER BY item: column + direction; `aggFn` (canonical name) is
    * set for `ORDER BY fn(col)`, legal only with GROUP BY. */
  final case class OrderItem(ref: ColRef, asc: Boolean,
      aggFn: Option[String] = None)

  final case class SelectStmt(projs: Seq[Proj], tables: Seq[String],
      where: Option[Pred], orderBy: Seq[OrderItem] = Nil, limit: Option[Long] = None,
      groupBy: Seq[ColRef] = Nil, having: Option[Pred] = None)

  /** Error class mirroring the reference's user-facing message taxonomy
    * (SURVEY.md §2.11). */
  final case class MiniSqlError(message: String) extends RuntimeException(message)

  // ----------------------------- Lexer --------------------------------
  private sealed trait Tok
  private case class Ident(s: String) extends Tok
  private case class Num(v: Long) extends Tok
  private case class Str(v: String) extends Tok
  private case class Sym(s: String) extends Tok

  private val aggFns = Set("max", "min", "sum", "avg", "average", "count")

  private def lex(q0: String): Vector[Tok] = {
    // strip `--` comments (sqlengine.py:60-61) and the trailing `;`
    val q = q0.linesIterator.map(l => l.indexOf("--") match {
      case -1 => l; case i => l.substring(0, i)
    }).mkString(" ").trim.stripSuffix(";")
    val toks = Vector.newBuilder[Tok]
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val end = q.indexOf(c, i + 1)
        if (end < 0) throw MiniSqlError("Syntax error: unterminated string literal")
        toks += Str(q.substring(i + 1, end)); i = end + 1
      } else if (c.isDigit || (c == '-' && i + 1 < q.length && q.charAt(i + 1).isDigit)) {
        val s = i; i += 1
        while (i < q.length && q.charAt(i).isDigit) i += 1
        toks += Num(q.substring(s, i).toLong)
      } else if (c.isLetter || c == '_') {
        val s = i
        while (i < q.length && (q.charAt(i).isLetterOrDigit || q.charAt(i) == '_')) i += 1
        toks += Ident(q.substring(s, i).toLowerCase)
      } else {
        val two = if (i + 1 < q.length) q.substring(i, i + 2) else ""
        if (Set("!=", "<>", "<=", ">=", "==").contains(two)) { toks += Sym(two); i += 2 }
        else if ("(),.*=<>".indexOf(c) >= 0) { toks += Sym(c.toString); i += 1 }
        else throw MiniSqlError(s"Syntax error near '$c'")
      }
    }
    toks.result()
  }

  // ----------------------------- Parser -------------------------------
  def parse(query: String): SelectStmt = new P(lex(query)).selectStmt()

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Option[Tok] = toks.lift(pos)
    private def next(): Tok = { val t = toks.lift(pos).getOrElse(fail("unexpected end of query")); pos += 1; t }
    private def fail(msg: String): Nothing = throw MiniSqlError(s"Syntax error: $msg")
    private def expectIdent(kw: String): Unit = next() match {
      case Ident(`kw`) => ()
      case t => fail(s"expected '$kw', found $t")
    }
    private def at(kw: String): Boolean = peek.contains(Ident(kw))
    private def atSym(s: String): Boolean = peek.contains(Sym(s))
    private def eatSym(s: String): Unit = next() match {
      case Sym(`s`) => (); case t => fail(s"expected '$s', found $t")
    }

    def selectStmt(): SelectStmt = {
      expectIdent("select")
      val projs = projList()
      expectIdent("from")
      val tables = tableList()
      val where = if (at("where")) { next(); Some(orExpr()) } else None
      // GROUP BY / HAVING: extension surface — the reference has only
      // whole-column aggregates (SURVEY §2.4); grouped aggregation was
      // previously reachable only through the DataFrame registry
      val group = if (at("group")) {
        next(); expectIdent("by")
        val cols = Vector.newBuilder[ColRef]
        cols += colRef()
        while (atSym(",")) { next(); cols += colRef() }
        cols.result()
      } else Vector.empty
      val having = if (at("having")) { next(); Some(orExpr()) } else None
      // ORDER BY / LIMIT: extension surface — the reference grammar has
      // neither (SURVEY §2.6)
      val order = if (at("order")) {
        next(); expectIdent("by")
        val items = Vector.newBuilder[OrderItem]
        def one(): Unit = {
          val (c, fn) = peek match {
            case Some(Ident(f)) if aggFns(f) =>
              val mark = pos
              next()
              if (atSym("(")) {
                eatSym("("); val r = colRef(); eatSym(")")
                (r, Some(if (f == "average") "avg" else f))
              } else { pos = mark; (colRef(), None) }
            case _ => (colRef(), None)
          }
          val asc =
            if (at("desc")) { next(); false }
            else { if (at("asc")) next(); true }
          items += OrderItem(c, asc, fn)
        }
        one()
        while (atSym(",")) { next(); one() }
        items.result()
      } else Vector.empty
      val limit = if (at("limit")) {
        next()
        next() match {
          case Num(n) if n >= 0 => Some(n)
          case t => fail(s"expected row count after 'limit', found $t")
        }
      } else None
      if (pos != toks.length) fail(s"unexpected trailing tokens")
      SelectStmt(projs, tables, where, order, limit, group, having)
    }

    private def projList(): Seq[Proj] = {
      val ps = Vector.newBuilder[Proj]
      ps += proj()
      while (atSym(",")) { next(); ps += proj() }
      ps.result()
    }

    private def proj(): Proj = next() match {
      case Sym("*") => Star
      case Ident("distinct") if atSym("(") =>
        eatSym("("); val c = colRef(); eatSym(")"); DistinctCol(c)
      case Ident(fn) if aggFns(fn) && atSym("(") =>
        eatSym("("); val c = colRef(); eatSym(")")
        AggCol(if (fn == "average") "avg" else fn, c)
      case Ident(name) => PlainCol(colRefTail(name))
      case t => fail(s"bad projection $t")
    }

    private def colRef(): ColRef = next() match {
      case Ident(name) => colRefTail(name)
      case t => fail(s"expected column, found $t")
    }

    private def colRefTail(first: String): ColRef =
      if (atSym(".")) { next(); next() match {
        case Ident(c) => ColRef(Some(first), c)
        case t => fail(s"expected column after '.', found $t")
      }} else ColRef(None, first)

    private def tableList(): Seq[String] = {
      val ts = Vector.newBuilder[String]
      def one(): Unit = next() match {
        case Ident(t) => ts += t
        case t => fail(s"expected table name, found $t")
      }
      one()
      while (atSym(",")) { next(); one() }
      ts.result()
    }

    private def orExpr(): Pred = {
      var l = andExpr()
      while (at("or")) { next(); l = OrPred(l, andExpr()) }
      l
    }

    private def andExpr(): Pred = {
      var l = condAtom()
      while (at("and")) { next(); l = AndPred(l, condAtom()) }
      l
    }

    private val wordOps = Map("eq" -> "=", "ne" -> "!=", "lt" -> "<",
      "le" -> "<=", "gt" -> ">", "ge" -> ">=")

    private def condAtom(): Pred =
      if (atSym("(")) { next(); val p = orExpr(); eatSym(")"); p }
      else {
        val l = operand()
        if (at("in") || at("not")) {
          val negated = at("not")
          if (negated) { next(); if (!at("in")) fail("expected 'in' after 'not'") }
          next(); eatSym("(")
          val vs = Vector.newBuilder[Operand]
          vs += operand()
          while (atSym(",")) { next(); vs += operand() }
          eatSym(")")
          InPred(l, vs.result(), negated)
        } else {
          val op = next() match {
            case Sym(s @ ("=" | "==" | "!=" | "<>" | "<" | ">" | "<=" | ">=")) =>
              s match { case "==" => "="; case "<>" => "!="; case o => o }
            case Ident(w) if wordOps.contains(w) => wordOps(w)
            case t => fail(s"expected comparison operator, found $t")
          }
          Cmp(l, op, operand())
        }
      }

    private def operand(): Operand = next() match {
      case Num(v) => NumLit(v)
      case Str(v) => StrLit(v)
      case Ident(fn) if aggFns(fn) && atSym("(") =>
        eatSym("("); val c = colRef(); eatSym(")")
        AggOperand(if (fn == "average") "avg" else fn, c)
      case Ident(name) => ColOperand(colRefTail(name))
      case t => fail(s"bad operand $t")
    }
  }
}
