package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark contract: run every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, print ONE short JSON line (the LAST line of stdout)
  * with per-query seconds. Uses the tuned GraftSession (AQE, extensions w/
  * fused vector kernels) — results are bit-identical to a vanilla session,
  * only faster.
  *
  * JSON legibility contract (VERDICT r1 §next-round #1): times are rounded
  * to 3 decimals, failures carry an explicit per-query `err` marker (never
  * silently read as a fast query), and the total line is printed last and
  * kept short so the driver's tail capture can always parse it.
  */
object Bench {
  private def r3(v: Double): Double = math.rint(v * 1000) / 1000

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark: SparkSession = GraftSession.local(cpus)
    // Warm the JVM/session once (tiny scan) so the first measured query
    // doesn't absorb all of codegen/classloading startup.
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err: Option[String] =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); None }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(80))
        }
      val sec = r3((System.nanoTime() - t0) / 1e9)
      // Drop cached/accumulated state between queries so later queries don't
      // pay earlier queries' heap debt (r1 driver bench showed 10× artifacts).
      spark.catalog.clearCache()
      (name, sec, err)
    }
    val failed = results.collect { case (n, _, Some(e)) =>
      // strip ALL control chars (tabs/CR/etc. appear in Spark messages) —
      // a literal control char inside a JSON string breaks strict parsers
      "\"" + n + "\":\"" + e.replace("\\", "\\\\").replace("\"", "'")
        .replaceAll("[\\x00-\\x1f]", " ") + "\""
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = r3(results.map(_._2).sum)
    val errJson = if (failed.isEmpty) "" else s""","errors":${failed.mkString("{", ",", "}")}"""
    // ONE short line, printed LAST, 3-decimal times — parseable from a tail capture.
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":${failed.size}$errJson,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
