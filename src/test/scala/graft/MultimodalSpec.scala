package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("binary meta: sizes and digests line up with the text payloads") {
    val rows = Multimodal.binaryMeta(spark, sf).collect()
    assert(rows.length == spark.read.parquet(s"$sf/documents.parquet").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bytes") > 0)
      assert(r.getAs[String]("sha").length == 64)
      assert(r.getAs[String]("kind") == "text") // corpus is lowercase words
    }
  }

  test("decode batch: header-parsed dims recover the encoded values for every doc") {
    val a = Multimodal.decodeBatch(spark, sf).collect()
    assert(a.length == spark.read.parquet(s"$sf/documents.parquet").count())
    a.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("format") == (if (id % 2 == 0) "png" else "jpeg"))
      assert(r.getAs[Long]("width") == id % 64 + 1)
      assert(r.getAs[Long]("height") == (id / 64) % 64 + 1)
      assert(r.getAs[Long]("n_bytes") > 0)
    }
  }

  test("frame sample: every 4th fixed-size frame, digests match direct slicing") {
    val rows = Multimodal.frameSample(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("frame_idx") % 4 == 0)
      assert(r.getAs[Long]("n_bytes") > 0 && r.getAs[Long]("n_bytes") <= 256)
    }
    // spot-check one frame digest against direct byte slicing
    val doc = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").head()
    val bytes = doc.getString(1).getBytes("UTF-8")
    val frame0 = java.util.Arrays.copyOfRange(bytes, 0, math.min(256, bytes.length))
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest(frame0).map("%02x".format(_)).mkString
    val got = Multimodal.frameSample(spark, sf)
      .filter(col("doc_id") === doc.getLong(0) && col("frame_idx") === 0)
      .head().getAs[String]("frame_md5")
    assert(got == expected)
  }

  test("resize halve: stride-2 subsample digest matches direct computation") {
    val doc = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").head()
    val frame0 = doc.getString(1).take(256)
    val half = frame0.zipWithIndex.collect { case (c, i) if i % 2 == 0 => c }.mkString
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest(half.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val row = Multimodal.resizeHalve(spark, sf)
      .filter(col("doc_id") === doc.getLong(0) && col("frame_idx") === 0)
      .head()
    assert(row.getAs[String]("half_md5") == expected)
    assert(row.getAs[Long]("half_bytes") == (frame0.length + 1) / 2)
  }

  /** A real PNG container prefix (signature + IHDR) for the given dims. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    def be4(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    sig ++ be4(13) ++ "IHDR".getBytes ++ be4(w) ++ be4(h) ++
      Array[Byte](8, 2, 0, 0, 0) ++ be4(0)
  }

  /** A real JPEG prefix (SOI + SOF0 segment) for the given dims. */
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    def be2(v: Int) = Array((v >>> 8).toByte, v.toByte)
    Array(0xFF, 0xD8, 0xFF, 0xC0, 0x00, 0x11, 0x08).map(_.toByte) ++
      be2(h) ++ be2(w) ++
      Array(0x03, 0x01, 0x11, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01).map(_.toByte)
  }

  test("feature extract: byte moments match a direct recount of the raw text") {
    val rows = Multimodal.featureExtract(spark, sf).collect()
    val texts = spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows.length == texts.count(_._2.nonEmpty))
    rows.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      val bytes = t.getBytes("UTF-8").map(_.toLong & 0xff)
      // the header strip must recover EXACTLY the original body: any
      // off-by-one in the parsed header length shifts every moment
      assert(r.getAs[Long]("n_px") == bytes.length)
      assert(r.getAs[Long]("px_sum") == bytes.sum)
      assert(r.getAs[Long]("px_sq_sum") == bytes.map(b => b * b).sum)
      assert(r.getAs[Long]("n_distinct") == t.toCharArray.distinct.length)
      val mean = bytes.sum.toDouble / bytes.length
      assert(math.abs(r.getAs[Double]("px_mean") - mean) < 1e-9)
      assert(r.getAs[Double]("px_var") >= 0.0)
    }
  }

  test("phash: identical bodies collide, a flipped sample bit separates") {
    val rows = Multimodal.phashDedup(spark, sf).collect()
    val nLong = spark.read.parquet(s"$sf/documents.parquet")
      .where(length(col("text")) >= 60).count()
    assert(rows.length == nLong, "one phash row per >=60-char doc")
    // group sizes are consistent: every member of a phash group reports
    // the same size, and sizes recount the group
    rows.groupBy(_.getAs[Long]("phash")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("group_size")).distinct.length == 1)
      assert(g.head.getAs[Long]("group_size") == g.length)
    }
  }

  test("pixel decode: real PNG codec round trip matches the analytic ground truth, map-only") {
    val df = graft.multimodal.Multimodal.pixelDecode(spark, sf)
    // map-only: a decode stage must never shuffle — scan → mapPartitions
    // → project, nothing else
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"pixel decode plan shuffles:\n${plan.take(800)}")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // ground-truth recount in plain Scala (no Spark, no codec): the
    // channel sums of the deterministic pixel function — the decoded
    // moments must reproduce them exactly (PNG is lossless)
    rows.take(25).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = (id % 64 + 1).toInt
      val h = (id / 64 % 64 + 1).toInt
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h,
        s"doc $id: decoded dims ${r.getAs[Int]("width")}×${r.getAs[Int]("height")} != $w×$h")
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sr += (((x * 7 + y * 13).toLong + id) % 256L)
        sg += (((x * 3 + y * 5).toLong + id * 2) % 256L)
        sb += (((x + y).toLong + id * 3) % 256L)
      }
      assert(r.getAs[Long]("sum_r") == sr && r.getAs[Long]("sum_g") == sg
        && r.getAs[Long]("sum_b") == sb,
        s"doc $id: codec round trip lost pixels (${r.getAs[Long]("sum_r")} vs $sr)")
      assert(math.abs(r.getAs[Double]("mean_r") - sr.toDouble / (w.toLong * h)) == 0.0)
    }
  }

  test("jpeg decode: lossy round trip inside the bound, map-only; a channel swap would flip") {
    val df = graft.multimodal.Multimodal.jpegDecode(spark, sf)
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"jpeg decode plan shuffles:\n${plan.take(800)}")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("width") == (id % 64 + 8).toInt
        && r.getAs[Int]("height") == (id / 64 % 64 + 8).toInt, s"doc $id dims")
      assert(r.getAs[Boolean]("jfif_magic"), s"doc $id: not a real JFIF stream")
      assert(r.getAs[Boolean]("r_faithful") && r.getAs[Boolean]("g_faithful")
        && r.getAs[Boolean]("b_faithful"), s"doc $id: codec error past the bound")
    }
    // hardness proof, no Spark: rebuild one image locally, run the SAME
    // JDK codec, and score the decoded R channel against the WRONG (B)
    // ramp — the error must overshoot the 24.0 bound by a wide margin,
    // so the pinned-TRUE oracle really would flip on a channel swap
    val (w, h) = (17, 23)
    def rampR(x: Int) = (x * 510 + (w - 1)) / (2 * (w - 1))
    def rampG(y: Int) = (y * 510 + (h - 1)) / (2 * (h - 1))
    def rampB(x: Int, y: Int) = 255 - ((x + y) * 510 + (w + h - 2)) / (2 * (w + h - 2))
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (rampR(x) << 16) | (rampG(y) << 8) | rampB(x, y))
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val prm = wr.getDefaultWriteParam
    prm.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    prm.setCompressionQuality(0.9f)
    val bos = new java.io.ByteArrayOutputStream()
    wr.setOutput(new javax.imageio.stream.MemoryCacheImageOutputStream(bos))
    wr.write(null, new javax.imageio.IIOImage(img, null, null), prm)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    var okErr = 0L; var swapErr = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val r = (back.getRGB(x, y) >> 16) & 0xFF
      okErr += math.abs(r - rampR(x)); swapErr += math.abs(r - rampB(x, y))
    }
    val n = w.toLong * h
    assert(okErr <= 24.0 * n, s"faithful error ${okErr.toDouble / n} outside the bound")
    assert(swapErr > 2 * 24.0 * n,
      s"swapped-channel error ${swapErr.toDouble / n} too close to the bound to detect")
  }

  test("pixel decode writes a genuine PNG container (signature + IDAT), not a synthesized header") {
    // encode one image exactly as the entry does and check the BYTES are
    // a real PNG: 8-byte signature, IHDR, a zlib-compressed IDAT chunk
    val img = new java.awt.image.BufferedImage(5, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val b = bos.toByteArray
    assert(b.take(8).map(_ & 0xFF).toSeq == Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A))
    val s = new String(b.map(x => (x & 0xFF).toChar))
    assert(s.contains("IHDR") && s.contains("IDAT") && s.contains("IEND"))
  }

  test("header parse reads dims from actual container bytes") {
    val s = spark
    import s.implicits._
    val png = pngBytes(640, 480)
    // tamper the low width byte of a copy: 640 -> 641 proves the parsed
    // width comes from the header bytes, not from any row metadata
    val tampered = png.clone(); tampered(19) = (tampered(19) + 1).toByte
    // a JPEG with an APPn segment before SOF0 whose payload bytes 1F FC 05
    // straddle an unaligned 'FFC0' hex pattern — the parser must skip it
    // and read the genuine byte-aligned SOF0 that follows
    val jpegWithApp = {
      val j = jpegBytes(320, 240)
      j.take(2) ++ Array(0xFF, 0xE0, 0x00, 0x05, 0x1F, 0xFC, 0x05).map(_.toByte) ++ j.drop(2)
    }
    val rows = Multimodal.parseMedia(
      Seq((1L, png), (2L, jpegBytes(1920, 1080)), (3L, tampered),
        (4L, "not an image at all".getBytes("UTF-8")), (5L, jpegWithApp))
        .toDF("doc_id", "payload")).collect().sortBy(_.getLong(0))
    assert(rows(0).getAs[String]("format") == "png")
    assert(rows(0).getAs[Long]("width") == 640 && rows(0).getAs[Long]("height") == 480)
    assert(rows(1).getAs[String]("format") == "jpeg")
    assert(rows(1).getAs[Long]("width") == 1920 && rows(1).getAs[Long]("height") == 1080)
    assert(rows(2).getAs[Long]("width") == 641)
    assert(rows(3).getAs[String]("format") == "unknown")
    assert(rows(3).isNullAt(rows(3).fieldIndex("width")))
    assert(rows(4).getAs[String]("format") == "jpeg")
    assert(rows(4).getAs[Long]("width") == 320 && rows(4).getAs[Long]("height") == 240)
  }

  test("wav probe: fields recount from doc_id + text, and come from the BYTES") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Multimodal.wavProbe(spark, sf).collect()
    assert(rows.length == texts.count(_._2.length >= 2))
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val t = texts(id)
      val ch = 1 + id % 2
      val sr = 8000 + (id % 4) * 4000
      val ns = t.getBytes("UTF-8").length / (ch * 2)
      assert(r.getAs[Long]("channels") == ch)
      assert(r.getAs[Long]("sample_rate") == sr)
      assert(r.getAs[Long]("bits_per_sample") == 16)
      assert(r.getAs[Long]("n_samples") == ns)
      assert(r.getAs[Double]("duration_s") ==
        math.floor(ns.toDouble / sr * 1e6 + 0.5) / 1e6)
      assert(r.getAs[Long]("n_frames") == (ns + 255) / 256)
      // BYTE-grain PCM replay (== code points only on this ASCII corpus;
      // the Unicode parity lives in UnicodeRobustnessSpec)
      val b = t.getBytes("UTF-8")
      val raw = (b(0) & 0xFF) + 256L * (b(1) & 0xFF)
      val s0 = if (raw >= 32768L) raw - 65536L else raw
      assert(r.getAs[Long]("first_sample") == s0)
    }
    // the parse reads header BYTES, not metadata: overwrite the low byte of
    // the little-endian sample-rate field (payload byte 25) with 0x01 and
    // the parsed rate must shift to (sr - sr%256 + 1)
    val media = Multimodal.synthesizeWav(
      spark.read.parquet(s"$sf/documents.parquet")
        .filter(length(col("text")) >= 2).limit(5))
    val tampered = media.withColumn("payload",
      concat(col("payload").substr(lit(1), lit(24)), unhex(lit("01")),
        col("payload").substr(lit(26), octet_length(col("payload")))))
    Multimodal.parseWav(tampered).collect().foreach { r =>
      val sr = 8000 + (r.getAs[Long]("doc_id") % 4) * 4000
      assert(r.getAs[Long]("sample_rate") == sr - sr % 256 + 1,
        s"doc ${r.getAs[Long]("doc_id")}: tampered byte not read")
    }
  }
}
