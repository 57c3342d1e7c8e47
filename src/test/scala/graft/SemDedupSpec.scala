package graft

import graft.dedup.SemDedup
import org.apache.spark.sql.functions._

/** Contract tests for the SemDeDup entry (cluster → within-cell ε-dedup →
  * min-id representative). The oracle proves cross-engine hash equality;
  * these prove the SEMANTIC invariants the hash can't articulate. */
class SemDedupSpec extends SparkSpec {

  test("survivors partition the corpus: drops each have a lower-id ε-neighbor in their cell") {
    val total = Tables.embeddings(spark, sf01).count()
    val out = SemDedup.semantic(spark, sf01).cache()
    val survivors = out.count()
    assert(survivors > 0 && survivors <= total)
    // every cell keeps at least one representative (ε-dedup never empties
    // a non-empty cell: the min-id member has no lower-id neighbor)
    val cells = out.groupBy("cell").count().collect()
    cells.foreach(r => assert(r.getLong(1) >= 1))
    // cell_size is consistent: per-cell survivor count <= reported size
    out.groupBy("cell").agg(count(lit(1)).as("kept"), first("cell_size").as("sz"))
      .collect()
      .foreach(r => assert(r.getAs[Long]("kept") <= r.getAs[Long]("sz")))
    out.unpersist()
  }

  test("prebuilt keep-list equals a fresh recompute bit-for-bit") {
    SemDedup.clearPrebuiltCellCache()
    val stored = SemDedup.semanticPrebuilt(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fresh = SemDedup.semantic(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stored == fresh, "the persisted semantic index must not drift")
    assert(stored.nonEmpty)
  }

  test("the within-cell pair join exchanges on (cell, _salt) — hot cells spread") {
    // same device as SkewSpec: the salt is load-bearing only if the join
    // actually exchanges on the salted key pair (subset co-partitioning
    // on the bare cell would put a hot cell back in one task)
    val plan = SemDedup.semantic(spark, sf01).queryExecution.executedPlan.toString()
    assert("hashpartitioning\\([^)]*_salt".r.findFirstIn(plan).isDefined,
      s"semantic pair join must exchange on (cell, _salt):\n${plan.take(1200)}")
  }

  test("exact-duplicate vectors collapse to the min-id survivor (edge corpus)") {
    val s2 = spark
    import s2.implicits._
    // vec 2 and 3 are identical axis vectors; 5 and 6 are distinct
    // directions (cosine < 0); 1 is the zero vector (no direction — must
    // survive, never compare as a duplicate)
    val embs = Seq(
      (1L, Array(0f, 0f, 0f, 0f), 0),
      (2L, Array(1f, 0f, 0f, 0f), 0),
      (3L, Array(1f, 0f, 0f, 0f), 1),
      (5L, Array(-1f, 2f, -3f, 4f), 2),
      (6L, Array(4f, -3f, 2f, -1f), 2))
      .toDF("vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("int"))
    val dir = java.nio.file.Files.createTempDirectory("graft_semdedup")
    embs.coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val kept = SemDedup.semantic(spark, dir.toString)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.contains(2L) && !kept.contains(3L),
      s"identical pair must keep min-id only, got $kept")
    assert(kept.contains(1L), "zero vector has no direction and must survive")
    assert(kept.contains(5L) && kept.contains(6L),
      "anti-parallel vectors are not semantic duplicates")
  }

  test("stored centroid model equals a fresh training bit-for-bit") {
    SemDedup.clearPrebuiltCellCache()
    val e = Tables.embeddings(spark, sf01).select(col("vec_id"), col("embedding"))
    val n = e.withColumn("nrm", graft.functions.VectorFunctions.norm(col("embedding")))
    val fresh = SemDedup.trainedCentroids(e, n)
      .select("cell", "centroid", "cnrm").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toList, r.getDouble(2))).toSet
    val stored = SemDedup.storedCentroids(spark, sf01)
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toList, r.getDouble(2))).toSet
    assert(stored == fresh,
      "the persisted K×dim centroid frame must equal a fresh Lloyd training")
    assert(stored.nonEmpty)
  }

  test("model width derives from the corpus: sf0.01 floors at SemK, sf0.1 grows") {
    val e01 = Tables.embeddings(spark, sf01).select(col("vec_id"), col("embedding"))
    val n01 = e01.withColumn("nrm", graft.functions.VectorFunctions.norm(col("embedding")))
    val k01 = SemDedup.trainedCentroids(e01, n01).count()
    assert(k01 == 8, s"500 vectors sit on the SemK=8 floor, got $k01")
    // sf0.1 has 2000 vectors → k = floor(2000/64) = 31 seeds; Lloyd may
    // empty a cell or two, so assert growth, bounded by the seed count
    val e1 = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select(col("vec_id"), col("embedding"))
    val n1 = e1.withColumn("nrm", graft.functions.VectorFunctions.norm(col("embedding")))
    val k1 = SemDedup.trainedCentroids(e1, n1).count()
    assert(k1 > 8 && k1 <= 31, s"sf0.1 must train a wider model than the floor, got $k1")
  }

  test("silhouette: covers the corpus, bounded in [-1,1], cells match dedup") {
    val rows = SemDedup.silhouette(spark, sf).collect()
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == nVecs,
      "every vector scored in exactly one cell")
    rows.foreach { r =>
      val m = r.getAs[Double]("mean_silhouette")
      assert(m >= -1.0 && m <= 1.0, s"cell ${r.getLong(0)}: silhouette $m out of range")
    }
    // the cells are the SAME model the dedup path assigns: cell ids and
    // occupancy must agree with dedup_semantic's (cell, cell_size) output
    val dedupCells = SemDedup.semantic(spark, sf).select("cell", "cell_size")
      .distinct().collect()
      .map(r => r.getAs[Long]("cell") -> r.getAs[Long]("cell_size")).toMap
    val silCells = rows.map(r => r.getAs[Long]("cell") -> r.getAs[Long]("n_vectors")).toMap
    dedupCells.foreach { case (c, n) =>
      assert(silCells.get(c).contains(n), s"cell $c occupancy drifted: $silCells vs $dedupCells")
    }
  }
}
