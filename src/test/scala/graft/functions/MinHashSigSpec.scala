package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class MinHashSigSpec extends SparkSpec {

  test("expression signature equals the explode + groupBy-min relational formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x1", "x2", "longerword")
    val docs = (1 to 120).map { id =>
      val n = rnd.nextInt(30) + 2
      (id.toLong, (1 to n).map(_ => vocab(rnd.nextInt(vocab.length))))
    }
    val df = docs.toDF("doc_id", "t")
    val as = (0 until Dedup.NumHashes).map(Dedup.hashA)
    val bs = (0 until Dedup.NumHashes).map(Dedup.hashB)
    val got = df.select(col("doc_id"), MinHashSigF(col("t"), Dedup.P, as, bs).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // relational twin: explode distinct bigrams, md5-prefix hash, 16 mins
    val exploded = df.select(col("doc_id"),
        explode(expr("array_distinct(transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1])))")).as("sh"))
      .withColumn("h", Md5PrefixModF(col("sh"), Dedup.P))
    val aggs = (0 until Dedup.NumHashes).map(i =>
      min((lit(Dedup.hashA(i)) * col("h") + lit(Dedup.hashB(i))) % Dedup.P).as(s"m$i"))
    val want = exploded.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to Dedup.NumHashes).map(r.getLong)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, sig) => assert(sig == want(id), s"doc $id") }
  }

  test("null tokens form no bigram and never throw") {
    import spark.implicits._
    val as = (0 until Dedup.NumHashes).map(Dedup.hashA)
    val bs = (0 until Dedup.NumHashes).map(Dedup.hashB)
    val df = Seq(
      Seq[String]("a", null, "b"),   // no adjacent non-null pair → all-sentinel
      Seq[String]("a", "b", null),   // one real bigram 'a b'
      Seq[String]("a", "b")).toDF("t")
    val sigs = df.select(MinHashSigF(col("t"), Dedup.P, as, bs))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0).forall(_ == Dedup.P)) // sentinel signature, caller-filterable
    assert(sigs(1) == sigs(2))           // trailing null changes nothing
  }

  test("signature lanes are in [0, P) and single-bigram docs are deterministic") {
    import spark.implicits._
    val df = Seq(Seq("a", "b"), Seq("a", "b"), Seq("b", "a")).toDF("t")
    val sigs = df.select(MinHashSigF(col("t"), Dedup.P,
      (0 until Dedup.NumHashes).map(Dedup.hashA),
      (0 until Dedup.NumHashes).map(Dedup.hashB))).collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))       // identical input, identical signature
    assert(sigs(0) != sigs(2))       // bigram order matters ('a b' vs 'b a')
    sigs.foreach(_.foreach(v => assert(v >= 0 && v < Dedup.P)))
  }
}
