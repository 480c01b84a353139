package graft

/** Defensive parsing for the `-Dgraft.*` JVM-start tuning knobs.
  *
  * Every numeric dial in the suite routes through these helpers so a
  * malformed value (`-Dgraft.bloomBits=lots`) behaves exactly like an
  * absent one — the operator falls back to its documented default —
  * instead of throwing `NumberFormatException` at plan-build time.
  * That matters doubly for the dials that are mirrored into the DuckDB
  * oracle SQL: both engines must resolve one malformed dial to the
  * SAME default, or the cross-engine contract silently diverges. */
object Dials {
  /** The dial as an Int, if present AND well-formed. */
  def int(name: String): Option[Int] =
    sys.props.get(name).flatMap(v => scala.util.Try(v.trim.toInt).toOption)

  /** The dial as a Long, if present AND well-formed. */
  def long(name: String): Option[Long] =
    sys.props.get(name).flatMap(v => scala.util.Try(v.trim.toLong).toOption)

  /** The dial as a lowercase trimmed token, if present AND one of
    * `valid` — any other value behaves like an absent dial, same as the
    * numeric accessors. */
  def str(name: String, valid: Set[String]): Option[String] =
    sys.props.get(name).map(_.trim.toLowerCase).filter(valid.contains)
}
