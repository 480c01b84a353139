package graft.emulator

/** Positional parameter binding by validated string substitution, the exact
  * semantics of the reference (`pkg/query/executor.go:148-280`): `:N`
  * placeholders replaced in descending key order (so `:1` can't clobber
  * `:10`), `?` placeholders replaced right-to-left by 1-based position, and
  * per-type formatting with injection guards (quote-escaping for text,
  * numeric parse checks, boolean normalization, regex-validated date/time/
  * timestamp literals — `executor.go:18-25,219-280`).
  *
  * Spark 4 also supports native positional markers in `spark.sql(sql, args)`;
  * the substitution path is kept because the wire contract exposes typed
  * `{type, value}` string bindings (`server/types/rest_api_v2.go:20-23`)
  * whose validation errors are part of the observable API
  * (`tests/e2e/rest_api_v2_test.go:881-1029`).
  */
object Bindings {

  final case class Binding(tpe: String, value: String)

  private val dateRe = """^\d{4}-\d{2}-\d{2}$""".r
  private val timeRe = """^\d{2}:\d{2}:\d{2}(\.\d+)?$""".r
  // optional offset/Z suffix like the reference's timestampRegex
  // (`executor.go:24`) — its e2e binds "2024-01-15T14:30:00Z"
  // (`tests/e2e/rest_api_v2_test.go:972-1000`)
  private val timestampRe =
    """^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}(\.\d+)?([+-]\d{2}:?\d{2}|Z)?$""".r

  def formatValue(b: Binding): String = {
    if (b == null) return "NULL"
    def quoted(v: String) = "'" + v.replace("'", "''") + "'"
    b.tpe.toUpperCase(java.util.Locale.ROOT) match {
      case "TEXT" | "VARCHAR" | "STRING" => quoted(b.value)
      case "FIXED" | "INTEGER" | "BIGINT" | "SMALLINT" | "TINYINT" =>
        if (scala.util.Try(b.value.trim.toLong).isFailure)
          throw SnowflakeError.compilation(s"invalid integer value: ${b.value}")
        b.value
      case "REAL" | "FLOAT" | "DOUBLE" | "NUMBER" | "DECIMAL" =>
        if (scala.util.Try(b.value.trim.toDouble).isFailure)
          throw SnowflakeError.compilation(s"invalid float value: ${b.value}")
        b.value
      case "BOOLEAN" =>
        val l = b.value.toLowerCase(java.util.Locale.ROOT)
        if (l == "true" || l == "1") "TRUE" else "FALSE"
      case "DATE" =>
        if (dateRe.findFirstIn(b.value).isEmpty)
          throw SnowflakeError.compilation(
            s"invalid DATE format: ${b.value} (expected YYYY-MM-DD)")
        s"DATE '${b.value}'"
      case "TIME" =>
        if (timeRe.findFirstIn(b.value).isEmpty)
          throw SnowflakeError.compilation(
            s"invalid TIME format: ${b.value} (expected HH:MM:SS)")
        // Spark has no TIME literal type (UNSUPPORTED_TIME_TYPE); the
        // regex-validated value rides as a string literal — the same
        // "14:30:00" the gosnowflake rowset would render, and the
        // validation (the reference's observable contract,
        // `executor.go:255-261`) is identical
        quoted(b.value)
      case "TIMESTAMP" | "TIMESTAMP_NTZ" | "TIMESTAMP_LTZ" | "TIMESTAMP_TZ" =>
        if (timestampRe.findFirstIn(b.value).isEmpty)
          throw SnowflakeError.compilation(
            s"invalid TIMESTAMP format: ${b.value} (expected YYYY-MM-DD HH:MM:SS)")
        s"TIMESTAMP '${b.value}'"
      case "NULL" => "NULL"
      case _ => quoted(b.value)
    }
  }

  /** Apply `:N` and `?` substitution (reference `executor.go:150-214`) with
    * a quote-aware scan: placeholders inside single-quoted literals (with
    * `''` escapes) and double-quoted identifiers are left untouched, so a
    * literal `'10:30:00'` or a `'?'` in quoted text never gets clobbered.
    * `?` markers are numbered 1-based left to right. */
  def apply(sql: String, bindings: Map[String, Binding]): String = {
    if (bindings.isEmpty) return sql
    bindings.keys.foreach { k =>
      if (scala.util.Try(k.toInt).isFailure)
        throw SnowflakeError.compilation(s"invalid binding key '$k': must be a number")
    }
    val out = new StringBuilder(sql.length + 32)
    var i = 0
    var inSq = false // single-quoted literal ('' escape = two toggles, safe)
    var inDq = false // double-quoted identifier
    var qIdx = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inSq) {
        out.append(c); if (c == '\'') inSq = false; i += 1
      } else if (inDq) {
        out.append(c); if (c == '"') inDq = false; i += 1
      } else c match {
        case '\'' => inSq = true; out.append(c); i += 1
        case '"' => inDq = true; out.append(c); i += 1
        case ':' if i + 1 < sql.length && sql.charAt(i + 1).isDigit =>
          var j = i + 1
          while (j < sql.length && sql.charAt(j).isDigit) j += 1
          bindings.get(sql.substring(i + 1, j).toInt.toString) match {
            case Some(b) if b != null => out.append(formatValue(b))
            case _ => out.append(sql, i, j)
          }
          i = j
        case '?' =>
          qIdx += 1
          bindings.get(qIdx.toString) match {
            case Some(b) if b != null => out.append(formatValue(b))
            case _ => out.append(c)
          }
          i += 1
        case _ => out.append(c); i += 1
      }
    }
    out.toString
  }
}
