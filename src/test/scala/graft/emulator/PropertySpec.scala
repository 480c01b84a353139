package graft.emulator

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests over the pure emulator layers — coverage the
  * reference's table-driven suites lack entirely (SURVEY §5: no
  * property-based testing anywhere in the Go repo).
  */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest (the scalatest-scalacheck
    * bridge isn't in the offline cache; raw ScalaCheck is). */
  private def check(prop: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  // ---- bindings ------------------------------------------------------

  test("bindings: every :N placeholder is replaced exactly, any count/order") {
    val gen = for {
      n <- Gen.choose(1, 30)
      values <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
    } yield values
    check(Prop.forAll(gen) { values =>
      val bindings = values.zipWithIndex.map { case (v, i) =>
        (i + 1).toString -> Bindings.Binding("FIXED", v.toString)
      }.toMap
      val sql = (1 to values.size).map(i => s":$i").mkString("SELECT ", ", ", "")
      val out = Bindings.apply(sql, bindings)
      out == values.mkString("SELECT ", ", ", "")
    })
  }

  test("bindings: TEXT values never break out of their quotes") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val v = Bindings.formatValue(Bindings.Binding("TEXT", s))
      // quoted, and every interior quote is doubled: stripping the outer
      // quotes and undoubling recovers the original
      v.head == '\'' && v.last == '\'' &&
        v.substring(1, v.length - 1).replace("''", "'") == s
    })
  }

  // ---- classifier ----------------------------------------------------

  test("classifier: leading whitespace and case never change the class") {
    val stmts = Gen.oneOf(
      "SELECT 1", "INSERT INTO t VALUES (1)", "UPDATE t SET a=1",
      "DELETE FROM t", "CREATE TABLE t (i INT)", "DROP TABLE t",
      "ALTER TABLE t ADD COLUMN c INT", "COPY INTO t FROM @s",
      "MERGE INTO t USING s ON 1=1 WHEN MATCHED THEN DELETE",
      "BEGIN", "COMMIT", "ROLLBACK", "SHOW TABLES", "EXPLAIN SELECT 1")
    val ws = Gen.listOf(Gen.oneOf(' ', '\t', '\n')).map(_.mkString)
    check(Prop.forAll(stmts, ws, Gen.oneOf(true, false)) { (sql, pad, lower) =>
      val mutated = pad + (if (lower) sql.toLowerCase else sql)
      Classifier.classify(mutated).tpe == Classifier.classify(sql).tpe
    })
  }

  // ---- table naming --------------------------------------------------

  test("naming: parse-then-flatten is stable under case and context") {
    val ident = Gen.nonEmptyListOf(Gen.alphaNumChar).map("T" + _.mkString)
      .map(_.take(20))
    check(Prop.forAll(ident, ident, ident) { (db, sc, t) =>
      val ref = TableNaming.parse(s"$db.$sc.$t", "X", "Y")
      val viaContext = TableNaming.parse(t, db, sc)
      ref == TableNaming.Ref(db.toUpperCase, sc.toUpperCase, t.toUpperCase) &&
        viaContext == ref &&
        TableNaming.flatten(db, sc, t) ==
          s"${db.toUpperCase}.${sc.toUpperCase}_${t.toUpperCase}"
    })
  }

  test("naming: literals and expression-position AS( never rewritten (parser path)") {
    // the parser-driven rewrite needs an active session
    graft.GraftSession.local(2)
    val ident = Gen.nonEmptyListOf(Gen.alphaChar).map("tbl_" + _.mkString.toLowerCase)
      .map(_.take(20))
    val keyword = Gen.oneOf("FROM", "JOIN", "INTO", "UPDATE")
    check(Prop.forAll(ident, ident, keyword) { (real, fake0, kw) =>
      val fake = fake0 + "_f" // never collides with the real table name
      // a table-ref-looking phrase inside a string literal, plus a window
      // definition (expression-position `name AS (`): neither may be
      // flattened; the genuine FROM target must be
      val sql = s"SELECT max(v) OVER w AS m, '$kw $fake' AS note " +
        s"FROM $real WINDOW w AS (PARTITION BY k)"
      val out = TableNaming.rewrite(sql, "D", "S")
      out.contains(s"'$kw $fake'") &&
        out.contains(s"`D`.`S_${real.toUpperCase}`") &&
        !out.contains(s"S_${fake.toUpperCase}") &&
        out.contains("WINDOW w AS (PARTITION BY k)")
    })
  }

  // ---- merge parser split -------------------------------------------

  test("splitTopLevel: never splits inside parens or quotes, rejoins clean") {
    val atom = Gen.oneOf("a", "f(x, y)", "'lit, eral'", "g(h(1,2), 3)", "col.b")
    check(Prop.forAll(Gen.nonEmptyListOf(atom)) { parts =>
      MergeParser.splitTopLevel(parts.mkString(", ")) == parts
    })
  }

  // ---- type mapper ---------------------------------------------------

  test("quoted spans: a marker inside any well-formed literal is never seen as code") {
    // literal interiors built from atomic units — plain chars, escaped
    // quote \', escaped backslash \\, doubled quote '' — so the scanner
    // faces every escape shape; the marker must always land inside a
    // span, and the same marker appended OUTSIDE must always be found
    val unit = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const(" "),
      Gen.const("\\'"), Gen.const("\\\\"), Gen.const("''"))
    val content = Gen.listOf(unit).map(_.mkString)
    val plain = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' ')))
      .map(_.mkString.replaceAll("(?i)streamx", "x"))
    val gen = for {
      n <- Gen.choose(1, 4)
      parts <- Gen.listOfN(n, Gen.zip(plain, content))
    } yield parts.map { case (p, c) => s"$p 'STREAMX $c' " }
      .mkString("SELECT ", "", "FROM t")
    val re = """(?i)\bSTREAMX\b""".r
    check(Prop.forAll(gen) { sql =>
      val inside = !Executor.mentionsOutsideQuotes(sql, re)
      val outside = Executor.mentionsOutsideQuotes(sql + " JOIN STREAMX", re)
      inside && outside
    })
  }

  test("type mapper: every snowflake type round-trips to a snowflake name") {
    val types = Gen.oneOf("NUMBER(10,2)", "DECIMAL(5,1)", "INT", "BIGINT",
      "FLOAT", "DOUBLE", "VARCHAR(100)", "TEXT", "BOOLEAN", "DATE",
      "TIMESTAMP_NTZ", "TIMESTAMP_TZ", "VARIANT", "OBJECT", "ARRAY",
      "BINARY", "GEOGRAPHY", "SOMETHING_UNKNOWN")
    check(Prop.forAll(types) { t =>
      // total function: never throws, always lands in the documented
      // result-name set (type_mapper.go collapse rules)
      val name = TypeMapper.toSnowflakeTypeName(TypeMapper.toSparkType(t))
      Set("NUMBER", "FLOAT", "TEXT", "BOOLEAN", "DATE", "TIMESTAMP_NTZ",
        "TIMESTAMP_TZ", "BINARY", "ARRAY", "OBJECT").contains(name)
    })
  }
}
