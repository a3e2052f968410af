package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DML verb routing for `Engine.query` — reference parity with
  * Mallard's router, which hands `UPDATE` / `DELETE` / `INSERT`
  * statements verbatim to DuckDB (`flight_server.py:320-331`).
  *
  * Spark has no mutable temp views, so the verbs are re-expressed as
  * *functional* catalog rewrites: parse the statement's skeleton
  * (target table, SET/WHERE/source clauses), parse the scalar pieces
  * with Spark's own `expr()` parser, build the post-statement
  * DataFrame, and swap it into the `Catalog` (view-replacement).
  * Readers see exactly what they would see after an in-place mutation;
  * the plan stays lazy, so Catalyst optimizes through the rewrite
  * (e.g. a later filter pushes below the UPDATE's projection).
  *
  * The skeleton scan is top-level-aware (parens + single-quoted
  * strings), so `WHERE`/`,`/`=` inside subqueries, function calls, or
  * string literals do not confuse it. Statement-level SQL semantics are
  * preserved deliberately:
  *  - all `SET` expressions evaluate against PRE-update rows (one
  *    simultaneous projection, not a `withColumn` chain);
  *  - `DELETE … WHERE c` removes rows where `c` IS TRUE — rows where
  *    `c` is NULL survive;
  *  - updated columns cast back to their declared type (a DuckDB
  *    UPDATE cannot change a column's type, so neither can ours);
  *  - `INSERT` aligns columns positionally (with an optional explicit
  *    column list), casts to the target schema, and APPENDS via
  *    `Catalog.put` — the reference's create-if-absent + INSERT
  *    semantics (`flight_server.py:388-400`).
  */
private[graft] object SqlVerbs {

  /** Execute `sqlText` if it is a DML verb; None → not DML. */
  def execute(engine: Engine, sqlText: String): Option[DataFrame] = {
    val t = sqlText.trim
    t.split("\\s+", 2)(0).toUpperCase match {
      case "UPDATE" => update(engine, t); Some(engine.statusOk)
      case "DELETE" => delete(engine, t); Some(engine.statusOk)
      case "INSERT" => insert(engine, t); Some(engine.statusOk)
      case _        => None
    }
  }

  // ---- skeleton scanning (top-level aware) -----------------------------

  /** Positions in `s` that are outside parens and '…' literals. */
  private def topLevel(s: String): Array[Boolean] = {
    val out = new Array[Boolean](s.length)
    var depth = 0; var inQ = false; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
      }
      out(i) = !inQ && depth == 0 && c != '(' && c != ')'
      i += 1
    }
    out
  }

  /** First top-level, word-bounded, case-insensitive `kw` at/after `from`. */
  private def findKeyword(s: String, kw: String, from: Int = 0): Int = {
    val tl = topLevel(s)
    var i = from
    while (i + kw.length <= s.length) {
      if (tl(i) && s.regionMatches(true, i, kw, 0, kw.length) &&
        (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1))) &&
        (i + kw.length == s.length ||
          !Character.isLetterOrDigit(s.charAt(i + kw.length)))) return i
      i += 1
    }
    -1
  }

  /** Split on top-level `sep` characters. */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val tl = topLevel(s)
    val parts = Seq.newBuilder[String]
    var start = 0
    for (i <- 0 until s.length if tl(i) && s.charAt(i) == sep) {
      parts += s.substring(start, i); start = i + 1
    }
    (parts += s.substring(start)).result().map(_.trim)
  }

  private def fail(sqlText: String, what: String): Nothing =
    throw new IllegalArgumentException(s"Cannot parse $what: $sqlText")

  // ---- UPDATE t SET a = e1, b = e2 [WHERE c] ---------------------------

  private val UpdateRe = "(?is)^UPDATE\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+SET\\s+(.*)$".r

  private def update(e: Engine, sqlText: String): Unit = sqlText match {
    case UpdateRe(table, rest) =>
      val wherePos = findKeyword(rest, "WHERE")
      val (setPart, cond) =
        if (wherePos < 0) (rest, None)
        else (rest.substring(0, wherePos),
          Some(expr(rest.substring(wherePos + 5))))
      val assigns: Map[String, Column] =
        splitTopLevel(setPart, ',').map { a =>
          val tl = topLevel(a)
          val eq = (0 until a.length).find(i => tl(i) && a.charAt(i) == '=')
            .getOrElse(fail(sqlText, "SET assignment"))
          a.substring(0, eq).trim.toLowerCase -> expr(a.substring(eq + 1))
        }.toMap
      val df = e.catalog.get(table)
      // one simultaneous projection: every SET expression sees the
      // pre-update row, matching statement-level UPDATE semantics
      val proj = df.schema.fields.map { f =>
        assigns.get(f.name.toLowerCase) match {
          case Some(ex) =>
            val v = cond.map(c => when(c, ex).otherwise(col(f.name))).getOrElse(ex)
            v.cast(f.dataType).as(f.name)
          case None => col(f.name)
        }
      }
      e.catalog.putReplace(table, df.select(proj.toIndexedSeq: _*))
    case _ => fail(sqlText, "UPDATE")
  }

  // ---- DELETE FROM t [WHERE c] -----------------------------------------

  private val DeleteRe = "(?is)^DELETE\\s+FROM\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*(.*)$".r

  private def delete(e: Engine, sqlText: String): Unit = sqlText match {
    case DeleteRe(table, rest0) =>
      val rest = rest0.trim
      val df = e.catalog.get(table)
      val out =
        if (rest.isEmpty) df.limit(0)
        else if (rest.toUpperCase.startsWith("WHERE"))
          // keep rows where the predicate is FALSE *or* NULL
          df.filter(!coalesce(expr(rest.substring(5)), lit(false)))
        else fail(sqlText, "DELETE tail")
      e.catalog.putReplace(table, out)
    case _ => fail(sqlText, "DELETE")
  }

  // ---- INSERT INTO t [(cols)] SELECT …|VALUES … ------------------------

  private val InsertRe = "(?is)^INSERT\\s+INTO\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+(.*)$".r

  private def insert(e: Engine, sqlText: String): Unit = sqlText match {
    case InsertRe(table, rest0) =>
      var rest = rest0.trim
      val colList: Option[Seq[String]] =
        if (rest.startsWith("(")) {
          val close = rest.indexOf(')')
          if (close < 0) fail(sqlText, "INSERT column list")
          val names = rest.substring(1, close).split(',').map(_.trim).toSeq
          rest = rest.substring(close + 1).trim
          Some(names)
        } else None
      // SELECT / WITH / VALUES are all valid standalone Spark queries
      val src = e.spark.sql(rest)
      if (!e.catalog.contains(table)) {
        // create-if-absent: first INSERT fixes the schema, like PUT
        val named = colList.map(src.toDF(_: _*)).getOrElse(src)
        e.catalog.put(table, named)
      } else {
        val target = e.catalog.get(table).schema
        val order = colList.getOrElse(target.fieldNames.toIndexedSeq)
        require(src.columns.length == order.length,
          s"INSERT expects ${order.length} columns, query produced ${src.columns.length}")
        val named = src.toDF(order: _*) // positional → target names
        val aligned = target.fields.map { f =>
          if (order.exists(_.equalsIgnoreCase(f.name)))
            col(f.name).cast(f.dataType).as(f.name)
          else lit(null).cast(f.dataType).as(f.name) // unlisted → NULL
        }
        e.catalog.put(table, named.select(aligned.toIndexedSeq: _*))
      }
    case _ => fail(sqlText, "INSERT")
  }
}
