package graft.emulator

/** Statement classifier — prefix match on the upper-cased SQL, a verbatim
  * port of the reference's pure string logic (`pkg/query/classifier.go:44-130`)
  * including the Snowflake `statementTypeId` values
  * (`pkg/config/constants.go:14-20`).
  */
object Classifier {

  sealed trait StatementType
  case object Query extends StatementType // SELECT, SHOW, DESCRIBE, EXPLAIN
  case object Dml extends StatementType // INSERT, UPDATE, DELETE, ...
  case object DdlCreate extends StatementType
  case object DdlDrop extends StatementType
  case object DdlAlter extends StatementType
  case object Copy extends StatementType
  case object Merge extends StatementType
  case object Transaction extends StatementType
  case object Other extends StatementType

  // gosnowflake statementTypeId values (constants.go:14-20)
  val StatementTypeSelect = 1L
  val StatementTypeInsert = 2L
  val StatementTypeDml = 3L
  val StatementTypeDdl = 4L
  val StatementTypeDrop = 5L

  final case class Result(
      tpe: StatementType,
      statementTypeId: Long,
      isQuery: Boolean,
      isDdl: Boolean,
      isDml: Boolean)

  /** Strip leading whitespace and SQL comments (block and line) so a
    * statement opening with a comment classifies by its first real
    * keyword — clients routinely send hint- or tool-generated comments
    * ahead of the verb. */
  @annotation.tailrec
  private[emulator] def stripLeading(s: String): String = {
    val t = s.dropWhile(_.isWhitespace)
    if (t.startsWith("/*")) {
      val end = t.indexOf("*/")
      if (end < 0) "" else stripLeading(t.substring(end + 2))
    } else if (t.startsWith("--")) {
      val nl = t.indexOf('\n')
      if (nl < 0) "" else stripLeading(t.substring(nl + 1))
    } else t
  }

  private def upper(sql: String): String =
    stripLeading(sql).trim.toUpperCase(java.util.Locale.ROOT)

  def classify(sql: String): Result = {
    val u = upper(sql)
    if (isQueryStatement(u))
      Result(Query, StatementTypeSelect, isQuery = true, isDdl = false, isDml = false)
    else if (u.startsWith("CREATE"))
      Result(DdlCreate, StatementTypeDdl, isQuery = false, isDdl = true, isDml = false)
    else if (u.startsWith("DROP"))
      Result(DdlDrop, StatementTypeDrop, isQuery = false, isDdl = true, isDml = false)
    else if (u.startsWith("ALTER"))
      Result(DdlAlter, StatementTypeDdl, isQuery = false, isDdl = true, isDml = false)
    else if (u.startsWith("COPY"))
      Result(Copy, StatementTypeDml, isQuery = false, isDdl = false, isDml = true)
    else if (u.startsWith("MERGE"))
      Result(Merge, StatementTypeDml, isQuery = false, isDdl = false, isDml = true)
    else if (isTransactionStatement(u))
      Result(Transaction, StatementTypeDml, isQuery = false, isDdl = false, isDml = false)
    else
      Result(Dml, StatementTypeDml, isQuery = false, isDdl = false, isDml = true)
  }

  private def isQueryStatement(u: String): Boolean =
    u.startsWith("SELECT") || u.startsWith("SHOW") || u.startsWith("DESCRIBE") ||
      u.startsWith("DESC") || u.startsWith("EXPLAIN") || u.startsWith("WITH")

  private def isTransactionStatement(u: String): Boolean =
    u.startsWith("BEGIN") || u.startsWith("START TRANSACTION") ||
      u.startsWith("COMMIT") || u.startsWith("ROLLBACK")

  def isQuery(sql: String): Boolean = classify(sql).isQuery
  def isDdl(sql: String): Boolean = classify(sql).isDdl
  def isCreateTable(sql: String): Boolean = upper(sql).startsWith("CREATE TABLE")
  def isDropTable(sql: String): Boolean = upper(sql).startsWith("DROP TABLE")
  def isCopy(sql: String): Boolean = upper(sql).startsWith("COPY")
  def isMerge(sql: String): Boolean = upper(sql).startsWith("MERGE")
  def isTransaction(sql: String): Boolean = isTransactionStatement(upper(sql))
  def isBegin(sql: String): Boolean = {
    val u = upper(sql); u.startsWith("BEGIN") || u.startsWith("START TRANSACTION")
  }
  def isCommit(sql: String): Boolean = upper(sql).startsWith("COMMIT")
  def isRollback(sql: String): Boolean = upper(sql).startsWith("ROLLBACK")
  def isUse(sql: String): Boolean = upper(sql).startsWith("USE")
}
