package graft

import org.apache.spark.sql.functions.col

import graft.ts.Identifiers

/** Identifier grammar round-trips + scheme validation, mirroring the
  * reference's weather/test/test_netatmo_identifiers.py:7-36 and
  * weather/test/test_ascii_clean.py:3-6.
  */
class IdentifiersSpec extends SparkSpec {

  test("netatmo id round-trip: create then parse restores the parameter set") {
    val id = Identifiers.netatmoIdStr("Superstation", "Basement", "Temperature")
    assert(id == "netatmo://?station_name=Superstation&module_name=Basement&data_type=Temperature")
    val p = Identifiers.parseNetatmoIdStr(id)
    assert(p == Map(
      "station_name" -> "Superstation",
      "module_name" -> "Basement",
      "data_type" -> "Temperature"))
  }

  test("parse of a non-netatmo scheme raises (scheme mismatch)") {
    intercept[IllegalArgumentException] {
      Identifiers.parseNetatmoIdStr("shyft://netatmo/superstation/basement/temperature")
    }
    intercept[IllegalArgumentException] {
      Identifiers.parseNetatmoIdStr("no-scheme-at-all")
    }
  }

  test("store id builds from cleaned components") {
    assert(Identifiers.storeIdStr("netatmo", "Superstation", "Base Ment", "Temperature")
      == "shyft://netatmo/superstation/base-ment/temperature")
  }

  test("ascii clean: Eftasåsen4 → eftas-sen4 (reference test_ascii_clean.py)") {
    assert(Identifiers.cleanNameStr("Eftasåsen4") == "eftas-sen4")
    assert(Identifiers.cleanNameStr("abc XYZ_9") == "abc-xyz-9")
  }

  test("column expressions agree with the driver-side string variants") {
    import spark.implicits._
    val df = Seq(("Eftasåsen4", "CamelCaseName", "netatmo://?station_name=S&module_name=M&data_type=T"))
      .toDF("raw", "camel", "url")
    val r = df.select(
      Identifiers.cleanName(col("raw")),
      Identifiers.camelToSnake(col("camel")),
      Identifiers.scheme(col("url")),
      Identifiers.queryParam(col("url"), "module_name")).collect()(0)
    assert(r.getString(0) == "eftas-sen4")
    assert(r.getString(1) == "camel_case_name")
    assert(r.getString(2) == "netatmo")
    assert(r.getString(3) == "M")
  }

  test("scheme routing key extraction") {
    assert(Identifiers.schemeOf("heartbeat://callback/ping").contains("heartbeat"))
    assert(Identifiers.schemeOf("mock1://a/1.5").contains("mock1"))
    assert(Identifiers.schemeOf("not a url").isEmpty)
  }
}
