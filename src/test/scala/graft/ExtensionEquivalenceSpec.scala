package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule shipped with the engine (WindowTopKRewrite) claims
  * to be semantics-preserving; the driver measures every query WITH it
  * active. This spec pins the claim across the WHOLE inventory: every
  * `SparkEntry.queries` entry must return identical rows under a session
  * with GraftExtensions and under a plain session. A divergence anywhere
  * — a rewrite firing on a shape it shouldn't, a registered function
  * shadowing a builtin — fails here by name. */
class ExtensionEquivalenceSpec extends AnyFunSuite {

  private def freshSession(withExt: Boolean): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
      .master("local[4]")
      .appName(s"graft-equiv-$withExt")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    (if (withExt) b.withExtensions(new GraftExtensions) else b).getOrCreate()
  }

  test("every inventory query returns identical rows with and without GraftExtensions") {
    val prior = SparkSession.getDefaultSession
    try {
      val ext = freshSession(withExt = true)
      val plain = freshSession(withExt = false)
      val sfDir = SparkSpec.sfDir
      val diverged = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        val a = fn(ext, sfDir).collect().toSeq
        val b = fn(plain, sfDir).collect().toSeq
        if (a == b) None else Some(name)
      }
      assert(diverged.isEmpty, s"queries diverging under GraftExtensions: $diverged")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
