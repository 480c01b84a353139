package graft.server

import com.fasterxml.jackson.databind.ObjectMapper
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent-client load e2e over real HTTP sockets (r14 VERDICT "Next
  * round" #5). EmulatorServerSpec is functional; this suite is the load/
  * isolation half: twelve live sessions (half on the gosnowflake v1 wire,
  * half on REST v2) hammer ONE server in parallel with a query mix —
  * session variables, ALTER SESSION parameters, private transactions, and
  * shared-table reads — asserting:
  *
  *  - no cross-session bleed: each session reads back exactly the
  *    variable/parameter values IT set, while eleven others are setting
  *    different values for the same names;
  *  - per-session transaction snapshots: a ROLLBACK never loses rows, a
  *    COMMIT always lands, under full concurrency;
  *  - readers of a shared table only ever observe committed batch
  *    boundaries (never a torn write);
  *  - no statement-manager races: every v2 handle submitted concurrently
  *    replays its own result.
  *
  * The reference serializes ALL writes behind one connection mutex
  * (`connection/manager.go:39-63`); this suite demonstrates the stronger
  * property the emulator claims — correct isolation WITHOUT a global
  * write lock.
  */
class ConcurrentClientsSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private lazy val server = {
    val s = EmulatorServer(graft.GraftSession.local(4))
    s.start()
    s
  }
  private lazy val base = s"http://127.0.0.1:${server.actualPort}"
  private val client = HttpClient.newHttpClient()

  private def post(path: String, body: String, headers: Seq[(String, String)] = Nil) = {
    val b = HttpRequest.newBuilder(URI.create(base + path))
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .header("Content-Type", "application/json")
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), mapper.readTree(resp.body()))
  }

  private def get(path: String, headers: Seq[(String, String)] = Nil) = {
    val b = HttpRequest.newBuilder(URI.create(base + path)).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), mapper.readTree(resp.body()))
  }

  private def login(name: String): String = {
    val (_, body) = post(
      "/session/v1/login-request?databaseName=CONC_DB&schemaName=PUBLIC",
      s"""{"data":{"LOGIN_NAME":"$name","PASSWORD":"p"}}""")
    assert(body.get("success").asBoolean(), body)
    body.get("data").get("token").asText()
  }

  /** One session's SQL runner: even ids drive the gosnowflake v1 wire,
    * odd ids drive REST v2 — both carry the same token so both protocols
    * are exercised against per-session state. Returns the first data row
    * (or null) and asserts wire-level success. */
  private final class Client(id: Int) {
    val token: String = login(s"conc_user_$id")
    private val v1Auth = Seq("Authorization" -> s"""Snowflake Token="$token"""")
    private val v2Auth = Seq("Authorization" -> s"Bearer $token")
    private val useV2 = id % 2 == 1

    def sql(text: String): com.fasterxml.jackson.databind.JsonNode = {
      val esc = text.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", " ")
      if (useV2) {
        val (code, body) = post("/api/v2/statements",
          s"""{"statement":"$esc","database":"CONC_DB","schema":"PUBLIC"}""",
          v2Auth)
        assert(code == 200 && body.get("code").asText() == "090001",
          s"session $id: $text -> $body")
        body.get("data")
      } else {
        val (_, body) = post("/queries/v1/query-request",
          s"""{"sqlText":"$esc"}""", v1Auth)
        assert(body.get("success").asBoolean(), s"session $id: $text -> $body")
        body.get("data").get("rowset")
      }
    }

    /** First column of the first row as text (v1 rowsets are strings,
      * v2 is typed — normalize through asText). */
    def scalar(text: String): String = {
      val rows = sql(text)
      assert(rows != null && rows.size() > 0, s"session $id: no rows for $text")
      rows.get(0).get(0).asText()
    }
  }

  test("12 concurrent sessions: variable/parameter isolation, private transactions, committed-batch reads, v2 handle replay") {
    val nSessions = 12
    val iterations = 5
    val batch = 10

    // shared fixtures (one bootstrap session)
    val boot = new Client(0)
    boot.sql("CREATE DATABASE IF NOT EXISTS CONC_DB")
    boot.sql("CREATE OR REPLACE TABLE shared_feed (id INTEGER, v VARCHAR)")
    (1 until nSessions).foreach { i =>
      boot.sql(s"CREATE OR REPLACE TABLE priv_$i (id INTEGER, note VARCHAR)")
      boot.sql(s"INSERT INTO priv_$i VALUES (0, 'seed')")
    }

    val errors = new ConcurrentLinkedQueue[Throwable]()
    val start = new CountDownLatch(1)

    // writer session: commits `batch`-row transactions into the shared
    // table — readers must only ever see multiples of `batch`
    val writer = new Thread(() => {
      try {
        val c = new Client(100)
        start.await()
        (0 until iterations).foreach { j =>
          c.sql("BEGIN")
          val vals = (0 until batch)
            .map(k => s"(${j * batch + k}, 'b$j')").mkString(", ")
          c.sql(s"INSERT INTO shared_feed VALUES $vals")
          c.sql("COMMIT")
        }
      } catch { case t: Throwable => errors.add(t) }
    }, "conc-writer")

    val workers = (1 until nSessions).map { i =>
      new Thread(() => {
        try {
          val c = new Client(i)
          start.await()
          (0 until iterations).foreach { j =>
            // 1. session VARIABLE isolation: same name, per-session value
            c.sql(s"SET who = 'sess-$i-iter-$j'")
            assert(c.scalar("SELECT $who AS v") == s"sess-$i-iter-$j",
              s"session $i: variable bled across sessions")
            // 2. session PARAMETER isolation (ALTER SESSION + readback)
            c.sql(s"ALTER SESSION SET QUERY_TAG = 'tag-$i-$j'")
            val params = c.sql("SHOW PARAMETERS LIKE 'QUERY_TAG'")
            assert(params.size() > 0 &&
              params.get(0).get(1).asText() == s"tag-$i-$j",
              s"session $i: QUERY_TAG bled: $params")
            // 3. transactions on the private table: rollback restores,
            //    commit persists — exact counts, no interference
            val before = c.scalar(s"SELECT COUNT(*) AS n FROM priv_$i").toLong
            c.sql("BEGIN")
            c.sql(s"INSERT INTO priv_$i VALUES (${j + 1}, 'gone')")
            c.sql("ROLLBACK")
            assert(c.scalar(s"SELECT COUNT(*) AS n FROM priv_$i").toLong
              == before, s"session $i: rollback lost/kept rows")
            c.sql("BEGIN")
            c.sql(s"INSERT INTO priv_$i VALUES (${j + 1}, 'kept')")
            c.sql("COMMIT")
            assert(c.scalar(s"SELECT COUNT(*) AS n FROM priv_$i").toLong
              == before + 1, s"session $i: commit did not land")
            // 4. shared reads: only committed batch boundaries visible
            val n = c.scalar("SELECT COUNT(*) AS n FROM shared_feed").toLong
            assert(n % batch == 0,
              s"session $i: torn read of shared_feed: $n rows")
          }
        } catch { case t: Throwable => errors.add(t) }
      }, s"conc-worker-$i")
    }

    (workers :+ writer).foreach(_.start())
    start.countDown()
    (workers :+ writer).foreach(_.join(300000))

    if (!errors.isEmpty) {
      val first = errors.peek()
      fail(s"${errors.size} concurrent-session failures; first: $first", first)
    }

    // final shared count: all writer batches committed
    assert(boot.scalar("SELECT COUNT(*) AS n FROM shared_feed").toLong
      == iterations.toLong * batch)

    // 5. statement-manager race check: concurrent v2 submissions each
    //    replay THEIR OWN result by handle
    val handles = new ConcurrentLinkedQueue[(Int, String)]()
    val subThreads = (0 until 8).map { i =>
      new Thread(() => {
        try {
          val (_, sub) = post("/api/v2/statements",
            s"""{"statement":"SELECT $i AS tag, COUNT(*) AS n FROM shared_feed","database":"CONC_DB"}""",
            Seq("Authorization" -> s"Bearer ${boot.token}"))
          assert(sub.get("code").asText() == "090001", sub)
          handles.add((i, sub.get("statementHandle").asText()))
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    subThreads.foreach(_.start()); subThreads.foreach(_.join(120000))
    assert(errors.isEmpty, s"v2 submission failures: ${errors.peek()}")
    handles.forEach { case (i, h) =>
      val (_, replay) = get(s"/api/v2/statements/$h")
      assert(replay.get("data").get(0).get(0).asInt() == i,
        s"handle $h replayed a different statement's result")
    }
  }
}
