package graft

/** THROWAWAY r19 probe: dump .explain("formatted") for named queries to
  * plans/<suffix> files. Deleted before round freeze. */
object ProbeExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val spark = GraftSession.local(32)
    spark.read.parquet(s"$sfDir/region.parquet").count()
    new java.io.File(outDir).mkdirs()
    args.drop(3).foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"EXPLAINED $name -> $outDir/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"EXPLAIN-FAILED $name: ${e.getMessage}")
      }
      Bench.releaseState(spark)
    }
    spark.stop()
  }
}
