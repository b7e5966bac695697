package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Driver-comparator surface contract: every query with a DuckDB oracle
  * must emit ONLY scalar (atomic) columns — the round driver's pandas
  * comparator sorts rows by all columns to hash them, and array/map/struct
  * values crash that sort (round-2 kg_coref_nerpos regression). Schema-only
  * check: building the DataFrame never runs the job. */
class OracleSurfaceSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("every oracled query output is all-scalar") {
    val oracled = SparkEntry.oracleSql.keySet
    val missing = oracled -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
    for (name <- oracled.toSeq.sorted) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val bad = df.schema.fields.filter(f => f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => true
        case _ => false
      })
      assert(bad.isEmpty,
        s"$name emits non-scalar columns ${bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
    }
  }

  test("every query builds a resolvable plan with non-empty schema") {
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, sfDir)
      assert(df.schema.fields.nonEmpty, name)
    }
  }
}
