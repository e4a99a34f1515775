package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import graft.functions.{VectorExpressions => V}

  private def df2(a: Array[Float], b: Array[Float]) = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
  }

  test("dot matches hand computation") {
    val r = df2(Array(1f, 2f, 3f), Array(4f, 5f, 6f))
      .select(V.dot(col("a"), col("b"))).head().getDouble(0)
    assert(r == 32.0)
  }

  test("cosine of identical vectors is 1.0") {
    val v = Array(0.1f, -0.4f, 0.25f, 3f)
    val r = df2(v, v).select(V.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(r == 1.0)
  }

  test("cosine of orthogonal vectors is 0.0, zero vector yields 0.0") {
    assert(df2(Array(1f, 0f), Array(0f, 1f)).select(V.cosine(col("a"), col("b"))).head().getDouble(0) == 0.0)
    assert(df2(Array(0f, 0f), Array(1f, 1f)).select(V.cosine(col("a"), col("b"))).head().getDouble(0) == 0.0)
  }

  test("cosine matches double-precision reference on real embeddings") {
    val e = graft.Tables.embeddings(spark, sfDir).limit(20).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val df = graft.Tables.embeddings(spark, sfDir).limit(20)
    val pairs = df.select(col("vec_id").as("ida"), col("embedding").as("ea"))
      .crossJoin(df.select(col("vec_id").as("idb"), col("embedding").as("eb")))
      .select(col("ida"), col("idb"), V.cosine(col("ea"), col("eb")).as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    def ref(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { val x = a(i).toDouble; val y = b(i).toDouble; dot += x*y; na += x*x; nb += y*y }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    }
    for ((i, va) <- e; (j, vb) <- e)
      assert(pairs((i, j)) == ref(va, vb), s"pair ($i,$j)")
  }

  test("double-array columns are implicitly cast, not reinterpreted") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
    assert(df.select(V.cosine(col("a"), col("b"))).head().getDouble(0) == 1.0)
    assert(df.select(V.dot(col("a"), col("b"))).head().getDouble(0) == 5.0)
  }

  test("null input yields null") {
    import spark.implicits._
    val df = Seq((Some(Array(1f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(V.cosine(col("a"), col("b"))).head().isNullAt(0))
  }
}
