package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.Row

/** Value-level assertions for the Snowflake scalar surface, mirroring the
  * reference's e2e function tests (`tests/e2e/gosnowflake_test.go:175-338`:
  * IFF, NVL, NVL2, DATEADD 2024-01-01+7d = 2024-01-08, DATEDIFF
  * 2024-01-01→2024-01-10 = 9, LISTAGG) plus the engine's own vector/dedup
  * kernels.
  */
class SnowflakeFunctionsSpec extends SparkSpecBase {

  private def one(sql: String): Row = spark.sql(sql).collect()(0)

  test("iff") {
    assert(one("SELECT iff(85 >= 90, 'A', 'B')").getString(0) == "B")
    assert(one("SELECT iff(95 >= 90, 'A', 'B')").getString(0) == "A")
  }

  test("nvl / nvl2 / ifnull are native") {
    assert(one("SELECT nvl(NULL, 'fallback')").getString(0) == "fallback")
    assert(one("SELECT nvl('x', 'fallback')").getString(0) == "x")
    assert(one("SELECT nvl2('notnull', 'a', 'b')").getString(0) == "a")
    assert(one("SELECT nvl2(NULL, 'a', 'b')").getString(0) == "b")
    assert(one("SELECT ifnull(NULL, 42)").getInt(0) == 42)
  }

  test("sf_dateadd matches the reference e2e expectation (+7 day)") {
    assert(one("SELECT CAST(sf_dateadd('day', 7, DATE'2024-01-01') AS DATE)")
      .getDate(0).toString == "2024-01-08")
    assert(one("SELECT CAST(sf_dateadd('MM', 2, DATE'2024-01-31') AS DATE)")
      .getDate(0).toString == "2024-03-31")
  }

  test("sf_datediff matches the reference e2e expectation (9 days)") {
    assert(one("SELECT sf_datediff('day', DATE'2024-01-01', DATE'2024-01-10')")
      .getLong(0) == 9)
    assert(one("SELECT sf_datediff('year', DATE'2020-06-01', DATE'2024-01-10')")
      .getLong(0) == 3)
  }

  test("object_construct produces JSON text") {
    assert(one("SELECT object_construct('a', 1, 'b', 'x')").getString(0) ==
      """{"a":1,"b":"x"}""")
  }

  test("to_variant JSON-encodes scalars like CAST(x AS JSON)") {
    assert(one("SELECT to_variant('he\"llo')").getString(0) == "\"he\\\"llo\"")
    assert(one("SELECT to_variant(42)").getString(0) == "42")
    assert(one("SELECT to_variant(true)").getString(0) == "true")
    assert(one("SELECT to_variant(DATE'2024-01-01')").getString(0) == "\"2024-01-01\"")
    assert(one("SELECT to_variant(CAST(NULL AS STRING))").isNullAt(0))
  }

  test("flatten_array explodes") {
    val rows = spark.sql("SELECT flatten_array(array(1, 2, 3))").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("listagg native in Spark 4") {
    assert(one("SELECT listagg(c, ',') WITHIN GROUP (ORDER BY c) FROM VALUES ('b'), ('a') t(c)")
      .getString(0) == "a,b")
  }

  test("cosine_sim: identical, orthogonal, opposite, zero vectors") {
    val r = one("""SELECT
      cosine_sim(array(1.0F, 2.0F), array(1.0F, 2.0F)),
      cosine_sim(array(1.0F, 0.0F), array(0.0F, 1.0F)),
      cosine_sim(array(1.0F, 0.0F), array(-1.0F, 0.0F)),
      cosine_sim(array(0.0F, 0.0F), array(1.0F, 1.0F))""")
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 0.0)
    assert(math.abs(r.getDouble(2) + 1.0) < 1e-12)
    assert(r.getDouble(3) == 0.0)
  }

  test("cosine_sim interpreted eval matches codegen") {
    // Force interpreted path through the expression directly.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val a = Literal.create(ArrayData.toArrayData(Array(1.0f, 2.0f, 3.0f)), ArrayType(FloatType))
    val b = Literal.create(ArrayData.toArrayData(Array(4.0f, 5.0f, 6.0f)), ArrayType(FloatType))
    val interp = CosineSimilarity(a, b).eval(null).asInstanceOf[Double]
    val gen = one("SELECT cosine_sim(array(1.0F,2.0F,3.0F), array(4.0F,5.0F,6.0F))").getDouble(0)
    assert(math.abs(interp - gen) < 1e-15)
  }

  test("dot_product") {
    assert(one("SELECT dot_product(array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F))")
      .getDouble(0) == 32.0)
  }

  test("simhash64: identical inputs same hash; majority vote") {
    val r = one("""SELECT
      simhash64(array(1L, 2L, 3L)) = simhash64(array(1L, 2L, 3L)),
      simhash64(array(5L)),
      simhash64(array(5L, 5L, 7L))""")
    assert(r.getBoolean(0))
    assert(r.getLong(1) == 5L) // single element -> its own bits
    assert(r.getLong(2) == 5L) // majority of {5,5,7} per bit = 5|{} -> 5
  }

  test("simhash64 interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val xs = Literal.create(ArrayData.toArrayData(Array(17L, 99L, 1234567L)), ArrayType(LongType))
    val interp = SimHash64(xs).eval(null).asInstanceOf[Long]
    val gen = one("SELECT simhash64(array(17L, 99L, 1234567L))").getLong(0)
    assert(interp == gen)
  }

  test("parse_json validates and canonicalizes (JSON-text VARIANT model)") {
    assert(one("""SELECT parse_json('{"a" : 1, "b": [1, 2]}')""").getString(0)
      == """{"a":1,"b":[1,2]}""")
    assert(one("SELECT parse_json('not json')").isNullAt(0))
    assert(one("SELECT parse_json(NULL)").isNullAt(0))
  }
}
