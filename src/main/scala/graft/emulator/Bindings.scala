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
  private val timestampRe =
    """^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}(\.\d+)?$""".r

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
        s"TIME '${b.value}'"
      case "TIMESTAMP" | "TIMESTAMP_NTZ" | "TIMESTAMP_LTZ" | "TIMESTAMP_TZ" =>
        if (timestampRe.findFirstIn(b.value).isEmpty)
          throw SnowflakeError.compilation(
            s"invalid TIMESTAMP format: ${b.value} (expected YYYY-MM-DD HH:MM:SS)")
        s"TIMESTAMP '${b.value}'"
      case "NULL" => "NULL"
      case _ => quoted(b.value)
    }
  }

  /** Apply `:N` then `?` substitution (reference `executor.go:150-214`). */
  def apply(sql: String, bindings: Map[String, Binding]): String = {
    if (bindings.isEmpty) return sql
    val keys = bindings.keys.map { k =>
      scala.util.Try(k.toInt).getOrElse(
        throw SnowflakeError.compilation(s"invalid binding key '$k': must be a number"))
    }.toSeq.sorted(Ordering.Int.reverse)
    var result = sql
    keys.foreach { pos =>
      val b = bindings(pos.toString)
      if (b != null) result = result.replace(s":$pos", formatValue(b))
    }
    // ? placeholders right-to-left, 1-based
    val positions = result.zipWithIndex.collect { case ('?', i) => i }
    positions.reverseIterator.zip(positions.indices.reverseIterator).foreach {
      case (strIdx, qIdx) =>
        bindings.get((qIdx + 1).toString).filter(_ != null).foreach { b =>
          result = result.substring(0, strIdx) + formatValue(b) +
            result.substring(strIdx + 1)
        }
    }
    result
  }
}
