package graft.emulator

/** Snowflake 3-level names onto Spark's 2-level catalog, using the exact
  * flattening trick of the reference (`pkg/query/table_naming.go:23-40`):
  * Spark database = Snowflake DATABASE, Spark table = `SCHEMA_TABLE`.
  * Unquoted identifiers are upper-cased, the Snowflake convention the
  * reference applies everywhere (`table_naming.go:24-27`,
  * `repository.go:198-199`).
  */
object TableNaming {

  final case class Ref(database: String, schema: String, table: String)

  private def norm(s: String): String =
    s.trim.stripPrefix("\"").stripSuffix("\"").toUpperCase(java.util.Locale.ROOT)

  /** DATABASE.SCHEMA.TABLE -> `DATABASE`.`SCHEMA_TABLE` components. */
  def flatten(database: String, schema: String, table: String): String = {
    val d = norm(database); val s = norm(schema); val t = norm(table)
    if (d.nonEmpty && s.nonEmpty) s"$d.${s}_$t"
    else if (s.nonEmpty) s"${s}_$t"
    else t
  }

  /** Parse `table` / `schema.table` / `database.schema.table` (reference
    * `table_naming.go:42-66`), filling blanks from the session context. */
  def parse(ref: String, currentDb: String, currentSchema: String): Ref =
    ref.split('.').toSeq.map(norm) match {
      case Seq(t) => Ref(norm(currentDb), norm(currentSchema), t)
      case Seq(s, t) => Ref(norm(currentDb), s, t)
      case Seq(d, s, t) => Ref(d, s, t)
      case other =>
        throw SnowflakeError.compilation(s"invalid table reference: $ref")
    }

  /** Spark-side identifier for a parsed ref: `db`.`schema_table`. */
  def sparkName(r: Ref): String = s"`${r.database}`.`${r.schema}_${r.table}`"

  private val tableRefRe =
    ("""(?i)\b(FROM|JOIN|INTO|UPDATE|TABLE|USING)\s+""" +
      """((?:"[^"]+"|[A-Za-z_][A-Za-z_0-9$]*)""" +
      """(?:\.(?:"[^"]+"|[A-Za-z_][A-Za-z_0-9$]*)){0,2})""").r

  /** Keywords that can follow a table ref in FROM/JOIN position — anything
    * else there is an alias the user already wrote. */
  private val postRefKeywords = Set(
    "ON", "WHERE", "GROUP", "ORDER", "JOIN", "LEFT", "RIGHT", "FULL",
    "INNER", "CROSS", "OUTER", "UNION", "EXCEPT", "INTERSECT", "LIMIT",
    "HAVING", "SET", "VALUES", "LATERAL", "USING", "NATURAL", "SEMI",
    "ANTI", "WHEN", "MATCHED", "QUALIFY", "WINDOW", "PIVOT", "UNPIVOT")

  /** CTE / WINDOW-clause definitions: `name [(col, ...)] AS (` — the only
    * SQL shapes where a bare identifier is bound to a name usable in FROM
    * position later in the same statement. Those names must NOT be
    * rewritten into catalog names (the reference gets this free via
    * pass-through, `translator.go:121-127`). */
  private val localDefRe =
    """(?is)\b([A-Za-z_][A-Za-z_0-9$]*)\s*(?:\([^()]*\))?\s+AS\s*\(""".r

  /** Names bound locally by the statement itself (CTEs, named windows);
    * references to them stay untouched by [[rewrite]]. */
  private[emulator] def localNames(sql: String): Set[String] =
    localDefRe.findAllMatchIn(sql).map(m => norm(m.group(1))).toSet

  /** Internal temp-view names the emulator itself injects (query history,
    * RESULT_SCAN views, stream delta views); never flattened. */
  private def isInternalName(upper: String): Boolean =
    upper == "GRAFT_QUERY_HISTORY" || upper.startsWith("GRAFT_RESULT_SCAN") ||
      upper.startsWith("GRAFT_STREAM_") || upper.startsWith("GRAFT_TT_") ||
      upper.startsWith("GRAFT_PIPE_")

  /** Rewrite the table references of a SQL statement into flattened Spark
    * names, resolving 1- and 2-part names against the session's current
    * database/schema. Primary path: parse the statement with Spark's own
    * parser and splice replacements at the exact character spans of the
    * `UnresolvedRelation`/`UnresolvedTable` nodes — table names inside
    * string literals, comments, or expression-position `AS (` shapes can
    * never be touched because the parser never produces relations there.
    * When the text is not Spark-parseable (Snowflake-only constructs on
    * the pass-through path, double-quoted identifiers) the legacy
    * keyword-anchored regex path takes over. In FROM/JOIN/USING position,
    * when the user wrote no alias, the original bare table name is
    * injected as one so qualified column references (`users.id`) keep
    * resolving after flattening. Single-part names bound by a WITH clause
    * in the same statement are left alone — a CTE shadows any like-named
    * table, per SQL scoping. */
  def rewrite(sql: String, currentDb: String, currentSchema: String): String =
    parserRewrite(sql, currentDb, currentSchema)
      .getOrElse(regexRewrite(sql, currentDb, currentSchema))

  /** One table-name occurrence: exact character span, name parts, and
    * whether the user already aliased it. */
  private final case class Occurrence(start: Int, stop: Int,
    parts: Seq[String], aliased: Boolean, fromPosition: Boolean)

  /** Parse-tree-driven rewrite. None when the statement doesn't parse as
    * Spark SQL or a span can't be trusted — callers fall back to
    * [[regexRewrite]]. */
  private[emulator] def parserRewrite(sql: String, currentDb: String,
      currentSchema: String): Option[String] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedRelation, UnresolvedTable}
    import org.apache.spark.sql.catalyst.plans.logical.{SubqueryAlias, UnresolvedWith}
    import scala.collection.mutable
    val parser = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sessionState.sqlParser)
      .getOrElse(return None)
    val plan =
      try parser.parsePlan(sql)
      catch { case scala.util.control.NonFatal(_) => return None }

    val cteNames = mutable.Set.empty[String]
    val occ = mutable.Buffer.empty[Occurrence]
    val aliasedRels =
      java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    var unusableSpan = false

    // the identifier text as written must sit exactly at the origin span
    // (some nodes, e.g. UnresolvedIdentifier in DROP, carry whole-statement
    // origins we must not splice over)
    def spanOk(start: Int, stop: Int, parts: Seq[String]): Boolean =
      start >= 0 && stop < sql.length && start <= stop && {
        val text = sql.substring(start, stop + 1)
        text.replace("`", "").equalsIgnoreCase(parts.mkString("."))
      }

    def record(node: AnyRef, parts: Seq[String]): Unit = {
      val o = node.asInstanceOf[org.apache.spark.sql.catalyst.trees.TreeNode[_]].origin
      (o.startIndex, o.stopIndex) match {
        case (Some(start), Some(stop)) if spanOk(start, stop, parts) =>
          val before = precedingToken(sql, start)
          occ += Occurrence(start, stop, parts,
            aliased = aliasedRels.contains(node),
            fromPosition = before == "," || before == "FROM" || before == "JOIN" ||
              before == "USING")
        case _ => unusableSpan = true
      }
    }

    def walk(a: Any): Unit = a match {
      case sa: SubqueryAlias =>
        sa.child match { case r: UnresolvedRelation => aliasedRels.add(r); case _ => }
        sa.productIterator.foreach(walk)
      case w: UnresolvedWith =>
        w.cteRelations.foreach(t =>
          cteNames += t._1.toUpperCase(java.util.Locale.ROOT))
        w.productIterator.foreach(walk)
      case p: Product => p.productIterator.foreach(walk)
      case s: Iterable[_] => s.foreach(walk)
      case _ => ()
    }
    // two passes: aliases + CTE names first (order-independent), then spans
    walk(plan)
    def collect(a: Any): Unit = a match {
      case r: UnresolvedRelation => record(r, r.multipartIdentifier)
      case t: UnresolvedTable => record(t, t.multipartIdentifier)
      case p: Product => p.productIterator.foreach(collect)
      case s: Iterable[_] => s.foreach(collect)
      case _ => ()
    }
    collect(plan)
    if (unusableSpan) return None

    val targets = occ.filter { o =>
      val single = o.parts.lengthIs == 1
      val upper = o.parts.last.toUpperCase(java.util.Locale.ROOT)
      !(single && (cteNames.contains(upper) || isInternalName(upper)))
    }
    if (targets.exists(_.parts.lengthIs > 3)) return None
    var out = sql
    targets.sortBy(-_.start).foreach { o =>
      val ref = o.parts.map(norm) match {
        case Seq(t) => Ref(norm(currentDb), norm(currentSchema), t)
        case Seq(s, t) => Ref(norm(currentDb), s, t)
        case Seq(d, s, t) => Ref(d, s, t)
      }
      val alias =
        if (o.fromPosition && !o.aliased && aliasInjectable(sql, o.stop))
          s" ${ref.table}"
        else ""
      out = out.substring(0, o.start) + sparkName(ref) + alias +
        out.substring(o.stop + 1)
    }
    Some(out)
  }

  /** True when an alias may be appended right after the span ending at
    * `stop`: end of text, a separator, or a clause keyword. Relation
    * modifiers like TABLESAMPLE must stay adjacent to the name, so an
    * unknown following word suppresses injection. */
  private def aliasInjectable(sql: String, stop: Int): Boolean = {
    var i = stop + 1
    while (i < sql.length && sql.charAt(i).isWhitespace) i += 1
    if (i >= sql.length) return true
    val c = sql.charAt(i)
    if (c == ',' || c == ')' || c == ';') return true
    if (!(c.isLetter || c == '_')) return false
    val start = i
    while (i < sql.length && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
    postRefKeywords.contains(sql.substring(start, i).toUpperCase(java.util.Locale.ROOT))
  }

  /** The token immediately before position `start`: "," for a comma, else
    * the preceding word upper-cased, else "". */
  private def precedingToken(sql: String, start: Int): String = {
    var i = start - 1
    while (i >= 0 && sql.charAt(i).isWhitespace) i -= 1
    if (i < 0) return ""
    if (sql.charAt(i) == ',') return ","
    val end = i
    while (i >= 0 && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i -= 1
    sql.substring(i + 1, end + 1).toUpperCase(java.util.Locale.ROOT)
  }

  /** Legacy keyword-anchored regex rewrite — the fallback when the text is
    * not Spark-parseable. Same positions the reference's Go statement
    * paths rewrite. */
  private[emulator] def regexRewrite(sql: String, currentDb: String,
      currentSchema: String): String = {
    val local = localNames(sql)
    tableRefRe.replaceAllIn(sql, m => {
      val kw = m.group(1)
      val ref = m.group(2)
      // leave sub-selects, function-ish tokens, and statement-local
      // (CTE/window) names alone
      if (ref.equalsIgnoreCase("select") || ref.equalsIgnoreCase("lateral") ||
        (!ref.contains(".") && local.contains(norm(ref))))
        m.matched
      else {
        val r = parse(ref, currentDb, currentSchema)
        val kwU = kw.toUpperCase(java.util.Locale.ROOT)
        val aliasable = kwU == "FROM" || kwU == "JOIN" || kwU == "USING"
        val nextTok = "^\\s*([A-Za-z_][A-Za-z_0-9]*)".r
          .findFirstMatchIn(m.after.toString).map(_.group(1).toUpperCase(java.util.Locale.ROOT))
        val hasAlias = nextTok.exists(t => t == "AS" || !postRefKeywords.contains(t))
        val alias = if (aliasable && !hasAlias && !ref.contains("\"")) s" ${r.table}" else ""
        java.util.regex.Matcher.quoteReplacement(s"$kw ${sparkName(r)}$alias")
      }
    })
  }
}
