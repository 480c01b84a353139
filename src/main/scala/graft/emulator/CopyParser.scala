package graft.emulator

import graft.operators.CopyInto
import scala.util.matching.Regex

/** COPY INTO statement parser — the grammar of the reference's regex set
  * (`pkg/query/copy_processor.go:62-212`): `COPY INTO <table> FROM
  * @stage[/path]` with FILE_FORMAT=(TYPE=CSV|JSON, FIELD_DELIMITER,
  * RECORD_DELIMITER, SKIP_HEADER, TRIM_SPACE, STRIP_OUTER_ARRAY),
  * PATTERN='regex', ON_ERROR=CONTINUE|SKIP_FILE|ABORT, PURGE=TRUE,
  * VALIDATION_MODE. Table names 1/2/3-part, upper-cased.
  */
object CopyParser {

  final case class CopyStatement(
      target: TableNaming.Ref,
      stageName: String,
      stagePath: String,
      options: CopyInto.Options,
      validationMode: Boolean)

  private val copyIntoRe: Regex =
    """(?is)COPY\s+INTO\s+([^\s(]+)\s+FROM\s+@([^\s/]+)(/\S*)?""".r
  // one level of nesting so NULL_IF = ('a','b') survives inside the parens
  private val fileFormatRe: Regex =
    """(?is)FILE_FORMAT\s*=\s*\(((?:[^()]|\([^()]*\))+)\)""".r
  private val patternRe: Regex = """(?is)PATTERN\s*=\s*'([^']+)'""".r
  private val onErrorRe: Regex = """(?is)ON_ERROR\s*=\s*(\w+)""".r
  private val typeRe: Regex = """(?is)TYPE\s*=\s*(\w+)""".r
  private val fieldDelimRe: Regex = """(?is)FIELD_DELIMITER\s*=\s*'([^']*)'""".r
  private val recordDelimRe: Regex = """(?is)RECORD_DELIMITER\s*=\s*'([^']*)'""".r
  private val skipHeaderRe: Regex = """(?is)SKIP_HEADER\s*=\s*(\d+)""".r
  private val nullIfRe: Regex = """(?is)NULL_IF\s*=\s*\(([^)]*)\)""".r
  private val formatNameRe: Regex = """(?is)FORMAT_NAME\s*=\s*'?([\w.]+)'?""".r
  // bare form: FILE_FORMAT = my_fmt (no parens)
  private val bareFormatRe: Regex = """(?is)FILE_FORMAT\s*=\s*'?([A-Za-z_][\w.]*)'?""".r

  /** Parse a COPY INTO statement. `formatLookup` resolves a named file
    * format (`FILE_FORMAT = (FORMAT_NAME='x')` or `FILE_FORMAT = x`) to its
    * stored raw option text (reference stores formats in metadata,
    * `repository.go:76-85`); the stored text is parsed with the same
    * regexes as inline options. */
  def parse(sql: String, currentDb: String, currentSchema: String,
      formatLookup: String => Option[String] = _ => None): CopyStatement = {
    val m = copyIntoRe.findFirstMatchIn(sql.trim).getOrElse(
      throw SnowflakeError.compilation(s"invalid COPY INTO syntax: $sql"))

    val target = TableNaming.parse(m.group(1), currentDb, currentSchema)
    val stageName = m.group(2).toUpperCase(java.util.Locale.ROOT)
    val stagePath = Option(m.group(3)).map(_.stripPrefix("/")).getOrElse("")

    val upper = sql.toUpperCase(java.util.Locale.ROOT)
    val inlineFf = fileFormatRe.findFirstMatchIn(sql).map(_.group(1))
    val namedFormat = inlineFf.flatMap(t => formatNameRe.findFirstMatchIn(t))
      .map(_.group(1))
      .orElse(if (inlineFf.isEmpty)
        bareFormatRe.findFirstMatchIn(sql).map(_.group(1)) else None)
    val ffText = namedFormat match {
      case Some(name) =>
        formatLookup(name).getOrElse(throw SnowflakeError.notFound(
          s"file format ${name.toUpperCase(java.util.Locale.ROOT)} does not exist"))
      case None => inlineFf.getOrElse("")
    }
    val ffUpper = ffText.toUpperCase(java.util.Locale.ROOT)

    val nullIf = nullIfRe.findFirstMatchIn(ffText).map { nm =>
      nm.group(1).split(',').toSeq.map(_.trim.stripPrefix("'").stripSuffix("'"))
    }.getOrElse(Seq(""))

    val onError = onErrorRe.findFirstMatchIn(sql)
      .map(_.group(1).toUpperCase(java.util.Locale.ROOT)) match {
      case Some("CONTINUE") => CopyInto.Continue
      case Some("SKIP_FILE") => CopyInto.SkipFile
      case _ => CopyInto.Abort
    }

    val opts = CopyInto.Options(
      format = typeRe.findFirstMatchIn(ffText)
        .map(_.group(1).toUpperCase(java.util.Locale.ROOT)).getOrElse("CSV"),
      fieldDelimiter = fieldDelimRe.findFirstMatchIn(ffText)
        .map(_.group(1)).filter(_.nonEmpty).getOrElse(","),
      recordDelimiter = recordDelimRe.findFirstMatchIn(ffText)
        .map(_.group(1)).filter(_.nonEmpty)
        .map(_.replace("\\n", "\n").replace("\\r", "\r")).getOrElse("\n"),
      skipHeader = skipHeaderRe.findFirstMatchIn(ffText)
        .map(_.group(1).toInt).getOrElse(0),
      trimSpace = ffUpper.replaceAll("\\s", "").contains("TRIM_SPACE=TRUE"),
      nullIf = nullIf,
      stripOuterArray = ffUpper.replaceAll("\\s", "")
        .contains("STRIP_OUTER_ARRAY=TRUE"),
      pattern = patternRe.findFirstMatchIn(sql).map(_.group(1)),
      onError = onError,
      purge = upper.replaceAll("\\s", "").contains("PURGE=TRUE"))

    CopyStatement(target, stageName, stagePath, opts,
      validationMode = upper.contains("VALIDATION_MODE"))
  }
}
