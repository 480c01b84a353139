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

  /** Rewrite the table references of a SQL statement into flattened Spark
    * names, resolving 1- and 2-part names against the session's current
    * database/schema. Keyword-anchored (FROM/JOIN/INTO/UPDATE/TABLE/USING),
    * the same set of positions the reference's Go-implemented statement
    * paths rewrite. In FROM/JOIN/USING position, when the user wrote no
    * alias, the original bare table name is injected as one so qualified
    * column references (`users.id`) keep resolving after flattening.
    * Single-part names bound by a WITH clause in the same statement are
    * left alone — a CTE shadows any like-named table, per SQL scoping.
    */
  def rewrite(sql: String, currentDb: String, currentSchema: String): String = {
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
