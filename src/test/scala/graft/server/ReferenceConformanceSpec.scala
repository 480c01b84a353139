package graft.server

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.scalatest.funsuite.AnyFunSuite

/** r16 conformance replay (VERDICT r15 "Next round" #4): the reference's OWN
  * e2e suites — `tests/e2e/rest_api_v2_test.go` (REST v2: statements, object
  * CRUD, error shapes, binding validation) and `tests/e2e/gosnowflake_test.go`
  * (the v1 gosnowflake wire: login, query flow, function translations,
  * transactions, MERGE) — transliterated subtest-for-subtest against this
  * engine's real HTTP server. Every assertion cites the reference line it
  * replays; statements are kept verbatim.
  *
  * Two deliberate transliteration deltas, both test-harness mechanics rather
  * than contract:
  *  - the reference boots a FRESH in-process server per Go test function;
  *    this spec shares one server (Spark startup dominates), so replays that
  *    create identically-named tables run under their own database context
  *    (the wire feature built for exactly this isolation);
  *  - the gosnowflake driver itself is Go — its wire traffic (login-request,
  *    query-request, BEGIN/COMMIT/ROLLBACK as statements, session?delete=true)
  *    is replayed directly over HTTP, the same bytes the driver sends.
  */
class ReferenceConformanceSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private lazy val server = {
    val s = EmulatorServer(graft.GraftSession.local(4))
    s.start()
    s
  }
  private lazy val base = s"http://127.0.0.1:${server.actualPort}"
  private val client = HttpClient.newHttpClient()

  private def http(method: String, path: String, body: String = "",
      headers: Seq[(String, String)] = Nil): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(base + path))
      .method(method, if (body.isEmpty) HttpRequest.BodyPublishers.noBody()
        else HttpRequest.BodyPublishers.ofString(body))
      .header("Content-Type", "application/json")
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def json(s: String): JsonNode =
    if (s.isEmpty) mapper.createObjectNode() else mapper.readTree(s)

  /** POST /api/v2/statements with optional database context and bindings. */
  private def v2(statement: String, db: Option[String] = None,
      bindings: String = ""): JsonNode = {
    val esc = statement.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", " ").replace("\t", " ")
    val dbPart = db.map(d => s""","database":"$d"""").getOrElse("")
    val bindPart = if (bindings.isEmpty) "" else s""","bindings":$bindings"""
    val (code, body) = http("POST", "/api/v2/statements",
      s"""{"statement":"$esc"$dbPart$bindPart}""")
    assert(code == 200, s"HTTP $code for [$statement]: $body")
    json(body)
  }

  private def v2Ok(statement: String, db: Option[String] = None): JsonNode = {
    val r = v2(statement, db)
    assert(r.get("code").asText() == "090001",
      s"[$statement] -> ${r.get("code")} ${r.get("message")}")
    r
  }

  private def cell(r: JsonNode, row: Int, col: Int): String =
    r.get("data").get(row).get(col).asText()

  // ----------------------------------------------------------------
  // rest_api_v2_test.go
  // ----------------------------------------------------------------

  test("v2 SubmitStatement: SimpleSelect / SelectWithFunction / SelectMultipleColumns (rest_api_v2_test.go:93-156)") {
    Seq("SELECT 1 AS num",
      "SELECT IFF(1 = 1, 'yes', 'no') AS result",
      "SELECT 1 AS a, 2 AS b, 'hello' AS c").foreach { stmt =>
      val r = v2Ok(stmt)
      assert(r.get("statementHandle").asText().nonEmpty, stmt) // :145-147
      assert(r.get("resultSetMetaData") != null, stmt)         // :149-151
      assert(r.get("resultSetMetaData").get("numRows").asLong() == 1L, stmt)
    }
  }

  test("v2 GetStatement replays the handle with success code (rest_api_v2_test.go:159-202)") {
    val sub = v2Ok("SELECT 42 AS answer")
    val h = sub.get("statementHandle").asText()
    val (code, body) = http("GET", s"/api/v2/statements/$h")
    assert(code == 200)
    val got = json(body)
    assert(got.get("statementHandle").asText() == h)      // :193-195
    assert(got.get("code").asText() == "090001")          // :197-199
  }

  test("v2 DatabaseManagement: create 201 + list + get (rest_api_v2_test.go:205-280)") {
    val (c, body) = http("POST", "/api/v2/databases",
      """{"name":"TEST_DB_CONF","comment":"Test database"}""")
    assert(c == 201, body)                                 // :222-225
    assert(json(body).get("name").asText() == "TEST_DB_CONF") // :230-232
    val (lc, lbody) = http("GET", "/api/v2/databases")
    assert(lc == 200)                                      // :245-247
    assert(json(lbody).size() > 0)                         // :252-254
    val (gc, gbody) = http("GET", "/api/v2/databases/TEST_DB_CONF")
    assert(gc == 200)                                      // :267-269
    assert(json(gbody).get("name").asText() == "TEST_DB_CONF") // :274-276
  }

  test("v2 SchemaManagement: create 201 + list-contains + get (rest_api_v2_test.go:283-373)") {
    assert(http("POST", "/api/v2/databases", """{"name":"SCHEMA_TEST_DB"}""")._1 == 201)
    val (c, body) = http("POST", "/api/v2/databases/SCHEMA_TEST_DB/schemas",
      """{"name":"TEST_SCHEMA","comment":"Test schema"}""")
    assert(c == 201, body)                                 // :306-309
    assert(json(body).get("name").asText() == "TEST_SCHEMA") // :314-316
    val (lc, lbody) = http("GET", "/api/v2/databases/SCHEMA_TEST_DB/schemas")
    assert(lc == 200)
    val schemas = json(lbody)
    assert((0 until schemas.size())
      .exists(i => schemas.get(i).get("name").asText() == "TEST_SCHEMA")) // :337-347
    val (gc, gbody) = http("GET",
      "/api/v2/databases/SCHEMA_TEST_DB/schemas/TEST_SCHEMA")
    assert(gc == 200)                                      // :360-362
    assert(json(gbody).get("name").asText() == "TEST_SCHEMA") // :367-369
  }

  test("v2 ErrorHandling: 404 statement, 404 database, 400 invalid JSON, 400 empty statement (rest_api_v2_test.go:376-439)") {
    assert(http("GET", "/api/v2/statements/nonexistent-handle")._1 == 404) // :386-388
    assert(http("GET", "/api/v2/databases/NONEXISTENT_DB")._1 == 404)      // :400-402
    assert(http("POST", "/api/v2/statements", "invalid json")._1 == 400)   // :414-416
    assert(http("POST", "/api/v2/statements", """{"statement":""}""")._1 == 400) // :433-435
  }

  test("v2 WarehouseManagement: full lifecycle with states (rest_api_v2_test.go:442-596)") {
    val (c, body) = http("POST", "/api/v2/warehouses",
      """{"name":"TEST_WH_CONF","warehouse_size":"SMALL","comment":"Test warehouse"}""")
    assert(c == 201, body)                                 // :460-463
    val w = json(body)
    assert(w.get("name").asText() == "TEST_WH_CONF")       // :468-470
    assert(w.get("state").asText() == "SUSPENDED")         // :472-474
    val (lc, lbody) = http("GET", "/api/v2/warehouses")
    assert(lc == 200 && json(lbody).size() > 0)            // :487-496
    val (gc, gbody) = http("GET", "/api/v2/warehouses/TEST_WH_CONF")
    assert(gc == 200 && json(gbody).get("name").asText() == "TEST_WH_CONF") // :509-518
    val (rc, rbody) = http("POST", "/api/v2/warehouses/TEST_WH_CONF:resume")
    assert(rc == 200)                                      // :531-534
    assert(json(rbody).get("state").asText() == "ACTIVE")  // :539-541
    val (sc, sbody) = http("POST", "/api/v2/warehouses/TEST_WH_CONF:suspend")
    assert(sc == 200)                                      // :554-557
    assert(json(sbody).get("state").asText() == "SUSPENDED") // :562-564
    assert(http("DELETE", "/api/v2/warehouses/TEST_WH_CONF")._1 == 204) // :579-581
    assert(http("GET", "/api/v2/warehouses/TEST_WH_CONF")._1 == 404)    // :592-594
  }

  test("v2 SubmitStatement_DDL: CREATE TABLE and DROP TABLE via statement (rest_api_v2_test.go:599-673)") {
    assert(http("POST", "/api/v2/databases", """{"name":"DDL_TEST_DB"}""")._1 == 201)
    assert(http("POST", "/api/v2/databases/DDL_TEST_DB/schemas",
      """{"name":"DDL_TEST_SCHEMA"}""")._1 == 201)
    // the reference flattens {DB}.{SCHEMA}_{TABLE} per its own CLAUDE.md
    // note (:614); this engine resolves real 3-part names, so the verbatim
    // statement targets db DDL_TEST_DB with a table named
    // DDL_TEST_SCHEMA_TEST_TABLE under the default schema — same statement,
    // honest namespace
    v2Ok("CREATE TABLE DDL_TEST_DB.DDL_TEST_SCHEMA_TEST_TABLE (id INTEGER, name VARCHAR(100))") // :615-642
    v2Ok("DROP TABLE DDL_TEST_DB.DDL_TEST_SCHEMA_TEST_TABLE") // :645-672
  }

  test("v2 SubmitStatement_DML: INSERT / UPDATE / DELETE via statement (rest_api_v2_test.go:676-787)") {
    assert(http("POST", "/api/v2/databases", """{"name":"DML_TEST_DB"}""")._1 == 201)
    v2Ok("CREATE TABLE DML_TEST_DB.DML_TEST_SCHEMA_USERS (id INTEGER, name VARCHAR(100))")
    v2Ok("INSERT INTO DML_TEST_DB.DML_TEST_SCHEMA_USERS VALUES (1, 'Alice')")   // :699-726
    v2Ok("UPDATE DML_TEST_DB.DML_TEST_SCHEMA_USERS SET name = 'Bob' WHERE id = 1") // :729-756
    v2Ok("DELETE FROM DML_TEST_DB.DML_TEST_SCHEMA_USERS WHERE id = 1")          // :759-786
  }

  test("v2 DeleteDatabase: create, verify, delete 204, verify 404 (rest_api_v2_test.go:790-838)") {
    assert(http("POST", "/api/v2/databases", """{"name":"DELETE_TEST_DB"}""")._1 == 201)
    assert(http("GET", "/api/v2/databases/DELETE_TEST_DB")._1 == 200)   // :803-810
    assert(http("DELETE", "/api/v2/databases/DELETE_TEST_DB")._1 == 204) // :821-824
    assert(http("GET", "/api/v2/databases/DELETE_TEST_DB")._1 == 404)   // :833-835
  }

  test("v2 CreatedOn is epoch milliseconds (rest_api_v2_test.go:841-878)") {
    val before = System.currentTimeMillis()
    val r = v2Ok("SELECT 1 AS num")
    val after = System.currentTimeMillis()
    val createdOn = r.get("createdOn").asLong()
    assert(createdOn >= before && createdOn <= after,
      s"createdOn $createdOn not in [$before, $after]")     // :866-870
    assert(createdOn >= 1000000000000L)                     // :872-875
  }

  test("v2 BindingValidation: DATE/TIME/TIMESTAMP accept valid, reject invalid + injection (rest_api_v2_test.go:881-1028)") {
    // ValidDateBinding (:885-913)
    val d = v2("SELECT :1 AS dt",
      bindings = """{"1":{"type":"DATE","value":"2024-01-15"}}""")
    assert(d.get("code").asText() == "090001", d.get("message"))
    // InvalidDateBinding (:915-940)
    val bad = v2("SELECT :1 AS dt",
      bindings = """{"1":{"type":"DATE","value":"invalid-date"}}""")
    assert(bad.get("code").asText() != "090001")
    // ValidTimeBinding (:942-970)
    val t = v2("SELECT :1 AS tm",
      bindings = """{"1":{"type":"TIME","value":"14:30:00"}}""")
    assert(t.get("code").asText() == "090001", t.get("message"))
    // ValidTimestampBinding — RFC3339 'Z' suffix must pass (:972-1000)
    val ts = v2("SELECT :1 AS ts",
      bindings = """{"1":{"type":"TIMESTAMP","value":"2024-01-15T14:30:00Z"}}""")
    assert(ts.get("code").asText() == "090001", ts.get("message"))
    // SQLInjectionBlocked (:1002-1027)
    val inj = v2("SELECT :1 AS dt",
      bindings = """{"1":{"type":"DATE","value":"2024-01-15'; DROP TABLE users; --"}}""")
    assert(inj.get("code").asText() != "090001")
  }

  test("v2 StatementStatusURL present with /api/v2/statements/ prefix (rest_api_v2_test.go:1031-1062)") {
    val r = v2Ok("SELECT 1 AS num")
    val url = r.get("statementStatusUrl").asText()
    assert(url.nonEmpty)                                    // :1050-1052
    assert(url.startsWith("/api/v2/statements/"))           // :1054-1059
  }

  test("v2 MergeStatement: update-or-insert with verified rows (rest_api_v2_test.go:1065-1168)") {
    val db = Some("V2MERGE_DB")
    v2Ok("CREATE TABLE merge_target (id INTEGER, name VARCHAR, value INTEGER)", db)
    v2Ok("INSERT INTO merge_target VALUES (1, 'Alice', 100), (2, 'Bob', 200)", db)
    v2Ok("CREATE TABLE merge_source (id INTEGER, name VARCHAR, value INTEGER)", db)
    v2Ok("INSERT INTO merge_source VALUES (2, 'Bob Updated', 250), (3, 'Charlie', 300)", db)
    v2Ok("""MERGE INTO merge_target t
            USING merge_source s
            ON t.id = s.id
            WHEN MATCHED THEN UPDATE SET name = s.name, value = s.value
            WHEN NOT MATCHED THEN INSERT (id, name, value) VALUES (s.id, s.name, s.value)""", db)
    val sel = v2Ok("SELECT id, name, value FROM merge_target ORDER BY id", db)
    assert(sel.get("data").size() == 3)                     // :1131-1133
    val expected = Seq(("1", "Alice", "100"), ("2", "Bob Updated", "250"),
      ("3", "Charlie", "300"))                              // :1136-1144
    expected.zipWithIndex.foreach { case ((id, name, value), i) =>
      assert(cell(sel, i, 0) == id && cell(sel, i, 1) == name &&
        cell(sel, i, 2) == value,
        s"row $i: got (${cell(sel, i, 0)}, ${cell(sel, i, 1)}, ${cell(sel, i, 2)})")
    }
  }

  test("v2 AllSQLOperations: DDL + DML + functions + transactions (rest_api_v2_test.go:1194-1405)") {
    val db = Some("V2OPS_DB")
    // DDL_CREATE_TABLE (:1217-1223)
    v2Ok("CREATE TABLE ops_test (id INTEGER PRIMARY KEY, name VARCHAR, value DOUBLE)", db)
    // DML_INSERT (:1226-1232)
    v2Ok("INSERT INTO ops_test VALUES (1, 'Alice', 100.5), (2, 'Bob', 200.0), (3, 'Charlie', 150.0)", db)
    // Query_SELECT (:1235-1244)
    assert(v2Ok("SELECT * FROM ops_test ORDER BY id", db).get("data").size() == 3)
    // Query_IFF_Translation (:1247-1267)
    val iff = v2Ok("SELECT name, IFF(value > 150, 'HIGH', 'LOW') AS tier FROM ops_test ORDER BY id", db)
    assert(iff.get("data").size() == 3)
    assert(cell(iff, 0, 1) == "LOW")   // Alice 100.5 (:1257-1260)
    assert(cell(iff, 1, 1) == "HIGH")  // Bob 200.0 (:1261-1264)
    // Query_NVL_Translation (:1270-1283)
    v2Ok("INSERT INTO ops_test VALUES (4, NULL, 400.0)", db)
    val nvl = v2Ok("SELECT id, NVL(name, 'Unknown') AS name FROM ops_test WHERE id = 4", db)
    assert(cell(nvl, 0, 1) == "Unknown")
    // DML_UPDATE (:1286-1300)
    v2Ok("UPDATE ops_test SET value = 999.0 WHERE id = 1", db)
    val upd = v2Ok("SELECT value FROM ops_test WHERE id = 1", db)
    assert(Set("999", "999.0").contains(cell(upd, 0, 0)), cell(upd, 0, 0))
    // DML_DELETE (:1303-1316)
    v2Ok("DELETE FROM ops_test WHERE id = 4", db)
    assert(cell(v2Ok("SELECT COUNT(*) FROM ops_test WHERE id = 4", db), 0, 0) == "0")
    // Transaction_BEGIN_COMMIT (:1319-1346) — one v2 batch is one session,
    // so the BEGIN..COMMIT sequence rides MULTI_STATEMENT_COUNT=0 like a
    // driver autocommit-off burst does
    val (bc, bbody) = http("POST", "/api/v2/statements",
      """{"statement":"BEGIN; INSERT INTO ops_test VALUES (5, 'Eve', 500.0); COMMIT","database":"V2OPS_DB","parameters":{"MULTI_STATEMENT_COUNT":"0"}}""")
    assert(bc == 200 && json(bbody).get("code").asText() == "090001", bbody)
    assert(cell(v2Ok("SELECT COUNT(*) FROM ops_test WHERE id = 5", db), 0, 0) == "1")
    // Transaction_BEGIN_ROLLBACK (:1349-1376)
    val (rb, rbody) = http("POST", "/api/v2/statements",
      """{"statement":"BEGIN; INSERT INTO ops_test VALUES (99, 'Rollback', 999.0); ROLLBACK","database":"V2OPS_DB","parameters":{"MULTI_STATEMENT_COUNT":"0"}}""")
    assert(rb == 200 && json(rbody).get("code").asText() == "090001", rbody)
    assert(cell(v2Ok("SELECT COUNT(*) FROM ops_test WHERE id = 99", db), 0, 0) == "0")
    // DDL_ALTER_TABLE (:1379-1386)
    v2Ok("ALTER TABLE ops_test ADD COLUMN email VARCHAR(255)", db)
    // DDL_DROP_TABLE (:1389-1395)
    v2Ok("DROP TABLE ops_test", db)
    // DDL_DROP_TABLE_IF_EXISTS (:1398-1404)
    v2Ok("DROP TABLE IF EXISTS nonexistent_table", db)
  }

  // ----------------------------------------------------------------
  // gosnowflake_test.go — the v1 wire, replayed as the driver sends it
  // ----------------------------------------------------------------

  private def login(dbName: String): String = {
    val (_, body) = http("POST",
      s"/session/v1/login-request?databaseName=$dbName&schemaName=PUBLIC",
      """{"data":{"LOGIN_NAME":"testuser","PASSWORD":"testpass"}}""")
    val j = json(body)
    assert(j.get("success").asBoolean(), body)
    j.get("data").get("token").asText()
  }

  private def v1(token: String, sql: String): JsonNode = {
    val esc = sql.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", " ").replace("\t", " ")
    val (_, body) = http("POST", "/queries/v1/query-request",
      s"""{"sqlText":"$esc"}""",
      Seq("Authorization" -> s"""Snowflake Token="$token""""))
    json(body)
  }

  private def v1Ok(token: String, sql: String): JsonNode = {
    val r = v1(token, sql)
    assert(r.get("success").asBoolean(),
      s"[$sql] -> ${r.get("message")} ${r.get("code")}")
    r
  }

  private def rs(r: JsonNode, row: Int, col: Int): String =
    r.get("data").get("rowset").get(row).get(col).asText()

  test("gosnowflake BasicConnection: login + ping + SELECT 1 (gosnowflake_test.go:128-171)") {
    val tok = login("TEST_DB")
    // Ping == a trivial round-trip on the session (:145-149)
    assert(v1Ok(tok, "SELECT 1").get("success").asBoolean())
    // SELECT 1 AS test returns exactly one row with value 1 (:152-170)
    val r = v1Ok(tok, "SELECT 1 AS test")
    assert(r.get("data").get("rowset").size() == 1)
    assert(rs(r, 0, 0) == "1")
  }

  test("gosnowflake FunctionTranslations: IFF/NVL/NVL2/DATEADD/DATEDIFF/LISTAGG (gosnowflake_test.go:175-367)") {
    val tok = login("GSFN_DB")
    v1Ok(tok, "CREATE TABLE test_names (id INTEGER, name VARCHAR)") // :197-200
    v1Ok(tok, "INSERT INTO test_names VALUES (1, 'Alice'), (2, 'Bob'), (3, 'Charlie')") // :201-204
    assert(rs(v1Ok(tok, "SELECT IFF(1 = 1, 'yes', 'no')"), 0, 0) == "yes")  // :211-219
    assert(rs(v1Ok(tok, "SELECT IFF(1 = 2, 'yes', 'no')"), 0, 0) == "no")   // :220-228
    assert(rs(v1Ok(tok, "SELECT NVL(NULL, 'default')"), 0, 0) == "default") // :229-237
    assert(rs(v1Ok(tok, "SELECT NVL('value', 'default')"), 0, 0) == "value") // :238-246
    assert(rs(v1Ok(tok, "SELECT NVL2('value', 'has value', 'no value')"), 0, 0)
      == "has value")                                                       // :247-255
    assert(rs(v1Ok(tok, "SELECT NVL2(NULL, 'has value', 'no value')"), 0, 0)
      == "no value")                                                        // :256-264
    // DATEADD(day, 7, '2024-01-01') -> 2024-01-08 (:265-288)
    assert(rs(v1Ok(tok, "SELECT DATEADD(day, 7, '2024-01-01')"), 0, 0)
      .contains("2024-01-08"))
    // DATEDIFF(day, ...) -> exactly 9 (:289-322)
    assert(rs(v1Ok(tok, "SELECT DATEDIFF(day, '2024-01-01', '2024-01-10')"), 0, 0) == "9")
    // LISTAGG contains all names (:323-340 + containsAll :369-377)
    val agg = rs(v1Ok(tok, "SELECT LISTAGG(name, ', ') FROM test_names"), 0, 0)
    assert(Seq("Alice", "Bob", "Charlie").forall(agg.contains), agg)
  }

  test("gosnowflake HTTPAPI_DirectConnection: /health is 200 (gosnowflake_test.go:381-395)") {
    assert(http("GET", "/health")._1 == 200)
  }

  test("gosnowflake HTTPAPI_SessionClose: POST /session?delete=true is 200 (gosnowflake_test.go:398-423)") {
    val (code, _) = http("POST", "/session?delete=true", "",
      Seq("Authorization" -> """Snowflake Token="test-token""""))
    assert(code == 200) // :418-420
  }

  test("gosnowflake MergeStatement over the v1 wire (gosnowflake_test.go:427-529)") {
    val tok = login("GSMERGE_DB")
    v1Ok(tok, "CREATE TABLE merge_target (id INTEGER, name VARCHAR, value INTEGER)")
    v1Ok(tok, "INSERT INTO merge_target VALUES (1, 'Alice', 100), (2, 'Bob', 200)")
    v1Ok(tok, "CREATE TABLE merge_source (id INTEGER, name VARCHAR, value INTEGER)")
    v1Ok(tok, "INSERT INTO merge_source VALUES (2, 'Bob Updated', 250), (3, 'Charlie', 300)")
    v1Ok(tok, """MERGE INTO merge_target t
                 USING merge_source s
                 ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET name = s.name, value = s.value
                 WHEN NOT MATCHED THEN INSERT (id, name, value) VALUES (s.id, s.name, s.value)""")
    val r = v1Ok(tok, "SELECT id, name, value FROM merge_target ORDER BY id")
    val expected = Seq(("1", "Alice", "100"), ("2", "Bob Updated", "250"),
      ("3", "Charlie", "300"))                             // :495-503
    assert(r.get("data").get("rowset").size() == expected.size)
    expected.zipWithIndex.foreach { case ((id, name, value), i) =>
      assert(rs(r, i, 0) == id && rs(r, i, 1) == name && rs(r, i, 2) == value)
    }
  }

  test("gosnowflake AllSQLOperations: the README surface end-to-end (gosnowflake_test.go:533-912)") {
    val tok = login("GSOPS_DB")
    // CREATE TABLE with PRIMARY KEY + DEFAULT CURRENT_TIMESTAMP (:555-566)
    v1Ok(tok, """CREATE TABLE test_operations (
                   id INTEGER PRIMARY KEY,
                   name VARCHAR(100),
                   score INTEGER,
                   created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP)""")
    // INSERT with explicit column list (:569-581)
    v1Ok(tok, """INSERT INTO test_operations (id, name, score) VALUES
                 (1, 'Alice', 95), (2, 'Bob', 87), (3, 'Charlie', 92)""")
    // SELECT (:584-604)
    assert(v1Ok(tok, "SELECT id, name, score FROM test_operations ORDER BY id")
      .get("data").get("rowset").size() == 3)
    // IFF over rows (:607-627): Alice 95 -> A, Bob 87 -> B, Charlie 92 -> A
    val iff = v1Ok(tok, "SELECT name, IFF(score >= 90, 'A', 'B') AS grade FROM test_operations ORDER BY id")
    assert(rs(iff, 0, 1) == "A" && rs(iff, 1, 1) == "B" && rs(iff, 2, 1) == "A")
    // NVL (:630-647)
    assert(rs(v1Ok(tok, "SELECT NVL(NULL, 'default_value') AS result"), 0, 0)
      == "default_value")
    // UPDATE + verify (:650-668)
    v1Ok(tok, "UPDATE test_operations SET score = 88 WHERE name = 'Bob'")
    assert(rs(v1Ok(tok, "SELECT score FROM test_operations WHERE name = 'Bob'"), 0, 0) == "88")
    // DELETE + verify (:671-695)
    v1Ok(tok, "INSERT INTO test_operations (id, name, score) VALUES (99, 'ToDelete', 0)")
    v1Ok(tok, "DELETE FROM test_operations WHERE id = 99")
    assert(rs(v1Ok(tok, "SELECT COUNT(*) FROM test_operations WHERE id = 99"), 0, 0) == "0")
    // SHOW TABLES contains TEST_OPERATIONS (:698-729)
    val show = v1Ok(tok, "SHOW TABLES")
    val rows = show.get("data").get("rowset")
    assert((0 until rows.size()).exists { i =>
      val row = rows.get(i)
      (0 until row.size()).exists(j =>
        row.get(j).asText().toUpperCase.contains("TEST_OPERATIONS"))
    })
    // DESCRIBE TABLE returns >= 1 column row (:732-747)
    assert(v1Ok(tok, "DESCRIBE TABLE test_operations")
      .get("data").get("rowset").size() >= 1)
    // ALTER TABLE ADD COLUMN (:750-756)
    v1Ok(tok, "ALTER TABLE test_operations ADD COLUMN email VARCHAR(255)")
    // BEGIN/COMMIT as driver statements (:759-785)
    v1Ok(tok, "BEGIN")
    v1Ok(tok, "INSERT INTO test_operations (id, name, score) VALUES (10, 'TxTest', 100)")
    v1Ok(tok, "COMMIT")
    assert(rs(v1Ok(tok, "SELECT COUNT(*) FROM test_operations WHERE id = 10"), 0, 0) == "1")
    // BEGIN/ROLLBACK (:788-814)
    v1Ok(tok, "BEGIN")
    v1Ok(tok, "INSERT INTO test_operations (id, name, score) VALUES (20, 'RollbackTest', 100)")
    v1Ok(tok, "ROLLBACK")
    assert(rs(v1Ok(tok, "SELECT COUNT(*) FROM test_operations WHERE id = 20"), 0, 0) == "0")
    // MERGE INTO (:817-860)
    v1Ok(tok, "CREATE TABLE merge_src (id INTEGER, name VARCHAR, score INTEGER)")
    v1Ok(tok, "INSERT INTO merge_src VALUES (1, 'Alice Updated', 98), (100, 'NewPerson', 85)")
    v1Ok(tok, """MERGE INTO test_operations t
                 USING merge_src s
                 ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET name = s.name, score = s.score
                 WHEN NOT MATCHED THEN INSERT (id, name, score) VALUES (s.id, s.name, s.score)""")
    val a = v1Ok(tok, "SELECT name, score FROM test_operations WHERE id = 1")
    assert(rs(a, 0, 0) == "Alice Updated" && rs(a, 0, 1) == "98")
    val n = v1Ok(tok, "SELECT name, score FROM test_operations WHERE id = 100")
    assert(rs(n, 0, 0) == "NewPerson" && rs(n, 0, 1) == "85")
    // EXPLAIN (:863-876) — any result shape is acceptable, must not error
    v1Ok(tok, "EXPLAIN SELECT * FROM test_operations")
    // DROP TABLE (:879-885)
    v1Ok(tok, "DROP TABLE merge_src")
    // CREATE/DROP SCHEMA (:888-900)
    v1Ok(tok, "CREATE SCHEMA test_schema")
    v1Ok(tok, "DROP SCHEMA test_schema")
    // Cleanup (:903-909)
    v1Ok(tok, "DROP TABLE IF EXISTS test_operations")
  }
}
