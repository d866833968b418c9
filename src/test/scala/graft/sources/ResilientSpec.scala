package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSuite

/** Corrupt-record policy: permissive reads quarantine without dropping;
  * fail-fast reads die on the first malformed line. */
class ResilientSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  private def stage(): String = {
    val dir = tmpDir("resilient")
    Files.writeString(Paths.get(dir, "data.json"),
      """{"id": 1, "name": "ok-one"}
        |{"id": 2 "name": "missing-comma"}
        |{"id": 3, "name": "ok-three"}
        |not json at all
        |{"id": 5, "name": "ok-five"}
        |""".stripMargin)
    dir
  }

  test("permissive read parses clean rows and quarantines the rest, losing nothing") {
    val dir = stage()
    val df = Resilient.readJsonPermissive(spark, dir, schema)
    val (clean, dead) = Resilient.quarantine(df)
    assert(clean.count() == 3)
    assert(clean.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 5L))
    assert(dead.count() == 2, "both malformed lines must be quarantined")
    val letters = dead.collect().map(_.getString(0))
    assert(letters.exists(_.contains("missing-comma")))
    assert(letters.exists(_.contains("not json")))
  }

  test("fail-fast read throws on malformed input (errors.tolerance none)") {
    val dir = stage()
    val ex = intercept[Exception](
      Resilient.readJsonFailFast(spark, dir, schema).collect())
    assert(ex.getMessage.contains("FAILFAST") ||
      Option(ex.getCause).exists(_.getMessage.contains("FAILFAST")) ||
      ex.getMessage.toLowerCase.contains("malformed"))
  }
}
