package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump a query's full result rows (sorted, TSV) to a file —
  * the old-vs-new equivalence receipt for optimization rounds. Usage:
  * runMain graft.tools.DumpRows <sfDir> <outDir> name... */
object DumpRows {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val spark = graft.SessionTuning.shuffleScaleOut(graft.SessionTuning.inputSplits(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")), 32)
      .withExtensions(new graft.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val rows = df.collect().map(_.toSeq.map {
        case null => "NULL"
        case a: Array[_] => a.mkString("[", ",", "]")
        case s: Seq[_] => s.mkString("[", ",", "]")
        case x => x.toString
      }.mkString("\t")).sorted
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$name.tsv"),
        (rows.mkString("\n") + "\n").getBytes("UTF-8"))
      println(s"[dump] $name -> ${rows.length} rows")
    }
    spark.stop()
  }
}
