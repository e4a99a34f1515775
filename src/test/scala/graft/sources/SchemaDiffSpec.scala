package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

class SchemaDiffSpec extends SparkSpec {

  private val base = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("score", IntegerType, nullable = true),
    StructField("w", FloatType, nullable = true)))

  test("identical schemas diff empty and are compatible") {
    assert(SchemaDiff.diff(base, base).isEmpty)
    assert(SchemaDiff.compatible(base, base))
  }

  test("every change class is detected with the right breaking verdict") {
    val next = StructType(Seq(
      StructField("id", LongType, nullable = true),            // relaxed
      StructField("score", LongType, nullable = true),         // int->long widening
      StructField("w", DoubleType, nullable = true),           // float->double widening
      StructField("lang", StringType, nullable = true),        // added nullable
      StructField("must", StringType, nullable = false)))      // added required
    val d = SchemaDiff.diff(base, next).map(c => c.column -> c).toMap
    assert(d("text").kind == "removed" && d("text").breaking)
    assert(d("lang").kind == "added" && !d("lang").breaking)
    assert(d("must").kind == "added" && d("must").breaking)
    assert(d("score").kind == "type_changed" && !d("score").breaking,
      "int->long is the documented free widening")
    assert(d("w").kind == "type_changed" && !d("w").breaking)
    assert(d("id").kind == "nullability_relaxed" && !d("id").breaking)
    assert(!SchemaDiff.compatible(base, next), "removed column must block")
  }

  test("a narrowing type change is breaking; tightened nullability too") {
    val next = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),       // tightened
      StructField("score", StringType, nullable = true),       // int->string
      StructField("w", FloatType, nullable = true)))
    val d = SchemaDiff.diff(base, next).map(c => c.column -> c).toMap
    assert(d("score").breaking, "int->string is not a widening")
    assert(d("text").kind == "nullability_tightened" && d("text").breaking)
  }

  test("footer-only audit works on real parquet snapshots") {
    import spark.implicits._
    val dirA = java.nio.file.Files.createTempDirectory("schemaA").toString
    val dirB = java.nio.file.Files.createTempDirectory("schemaB").toString
    Seq((1L, "a")).toDF("id", "text").write.mode("overwrite").parquet(dirA)
    Seq((1L, "a", 0.5)).toDF("id", "text", "quality")
      .write.mode("overwrite").parquet(dirB)
    val rows = SchemaDiff.auditPaths(spark, dirA, dirB).collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "quality" && rows(0).getString(1) == "added" &&
      !rows(0).getBoolean(4))
  }
}
