package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** THROWAWAY measurement probe for the r19 streaming-floor attack
  * (VERDICT r18 next-round #3). Not part of the driver contract; deleted
  * before round freeze. */
object ProbeStream {
  private def t[A](label: String)(f: => A): Unit = {
    val runs = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    println(f"PROBE $label%-50s min=${runs.min}%.3f runs=${runs.map(r => f"$r%.3f").mkString(",")}")
  }

  private val sinkId = new java.util.concurrent.atomic.AtomicInteger(0)

  private def drainMem(df: DataFrame, mode: String, ckptRoot: Option[String]): Unit = {
    val name = s"probe_sink_${sinkId.incrementAndGet()}"
    val w0 = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow())
    val w = ckptRoot match {
      case Some(root) =>
        val dir = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get(root), "probe_ckpt")
        w0.option("checkpointLocation", dir.toString)
      case None => w0
    }
    val q = w.start()
    q.awaitTermination()
    df.sparkSession.table(name).collect()
    df.sparkSession.catalog.dropTempView(name)
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.read.parquet(s"$d/region.parquet").count()

    val dir = java.nio.file.Files.createTempDirectory("probe_region")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$d/region.parquet"), dir.resolve("region.parquet"))
    val sch = spark.read.parquet(s"$d/region.parquet").schema
    def src = spark.readStream.schema(sch).parquet(dir.toString)

    // events staged for the stream-stream mini-drain
    val evDir = java.nio.file.Files.createTempDirectory("probe_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$d/events.parquet"), evDir.resolve("events.parquet"))
    val evSch = spark.read.parquet(s"$d/events.parquet").schema
    def evStream = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.readStream.schema(evSch).parquet(evDir.toString)
      evSch("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    }

    def ssJoinPairs: DataFrame = {
      val ev = evStream
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
        .withWatermark("view_ts", "1 hour")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
          col("event_id").as("purchase_id"))
        .withWatermark("purchase_ts", "1 hour")
      views.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
    }

    def drainFiles(df: DataFrame, root: String): Unit = {
      val out = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(root), "probe_out")
      val q = df.writeStream.format("parquet")
        .option("path", s"$out/data")
        .option("checkpointLocation", s"$out/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.schema(df.schema).parquet(s"$out/data").groupBy().count()
        .write.mode("overwrite").format("noop").save()
    }

    def floorOnce(ckpt: Option[String]): Unit = drainMem(src.groupBy().count(), "complete", ckpt)
    def noData(v: String): Unit =
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", v)

    spark.conf.set("spark.sql.shuffle.partitions", "8")
    t("floor sp=8 base")(floorOnce(None))
    t("floor sp=8 shm")(floorOnce(Some("/dev/shm")))
    noData("false")
    t("floor sp=8 shm noData=off")(floorOnce(Some("/dev/shm")))
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    t("floor sp=2 shm noData=off")(floorOnce(Some("/dev/shm")))
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
    t("floor sp=8 shm noData=off maint=1h")(floorOnce(Some("/dev/shm")))
    spark.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "60s")
    noData("true")

    // stream-stream join: 4 state stores x sp partitions, files sink
    t("ssjoin sp=8 /tmp")(drainFiles(ssJoinPairs, sys.props("java.io.tmpdir")))
    t("ssjoin sp=8 shm")(drainFiles(ssJoinPairs, "/dev/shm"))
    noData("false")
    t("ssjoin sp=8 shm noData=off")(drainFiles(ssJoinPairs, "/dev/shm"))
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    t("ssjoin sp=4 shm noData=off")(drainFiles(ssJoinPairs, "/dev/shm"))
    noData("true")

    t("batch reference (noop agg)") {
      spark.read.parquet(dir.toString).groupBy().count()
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
