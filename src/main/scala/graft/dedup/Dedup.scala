package graft.dedup

import graft.{QueryModule, Tables}
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.E — the deduplication suite over `documents`.
  *
  * Scale design (§5): exact dedup is one shuffle on a 16-byte fingerprint;
  * near-dup detection never goes O(n²) — candidates come from an inverted
  * index (shared shingles), MinHash band buckets, SimHash chunk equality
  * (pigeonhole), or embedding LSH buckets, and only candidates pay the
  * exact-similarity verification.
  */
object Dedup extends QueryModule {

  private val P = 1000000007L

  private def withShingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("sh", array_distinct(wordNgrams(tokens(col("text")), 3)))

  // ---- exact dedup: fingerprint → one shuffle --------------------------
  def exact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(fingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_unique"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_dupes"))

  private val exactSql =
    """WITH f AS (SELECT md5(regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'), '\s+', ' ', 'g')) AS fp FROM documents)
      |SELECT COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_unique,
      |       COUNT(*) - COUNT(DISTINCT fp) AS n_dupes
      |FROM f""".stripMargin

  // ---- exact n-gram Jaccard via inverted index ---------------------------
  /** Top-20 most similar pairs by word-3-gram Jaccard. The shingle
    * inverted-index self-join bounds work to docs that actually share a
    * shingle — no cross join at any scale. */
  def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    val docs = withShingles(s, d).select(col("doc_id"), col("sh"),
      size(col("sh")).cast("long").as("n_sh"))
    val inv = docs.select(col("doc_id"), explode(col("sh")).as("sg"))
    val pairs = inv.select(col("doc_id").as("doc_a"), col("sg"))
      .join(inv.select(col("doc_id").as("doc_b"), col("sg").as("sg_b")),
        col("sg") === col("sg_b") && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(docs.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("shared").cast("double") / (col("na") + col("nb") - col("shared"))).as("jaccard"))
      .orderBy(desc("jaccard"), asc("doc_a"), asc("doc_b"))
      .limit(20)
  }

  private val ngramJaccardSql =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      | sh AS (SELECT doc_id, list_distinct([toks[i]||' '||toks[i+1]||' '||toks[i+2] FOR i IN generate_series(1, len(toks)-2)]) AS sh FROM t),
      | inv AS (SELECT doc_id, unnest(sh) AS sg FROM sh),
      | cnt AS (SELECT doc_id, len(sh) AS n_sh FROM sh),
      | pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      |           FROM inv a JOIN inv b ON a.sg = b.sg AND a.doc_id < b.doc_id
      |           GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      | CAST(shared AS DOUBLE) / (ca.n_sh + cb.n_sh - shared) AS jaccard
      |FROM pairs JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
      |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20""".stripMargin

  // ---- MinHash + banded LSH ----------------------------------------------
  /** 64-perm MinHash signature (universal hashing over xxhash64 of each
    * shingle), 16 bands × 4 rows; same-band-bucket docs become candidate
    * pairs, then exact Jaccard verifies. rows-only oracle: xxhash64 is not
    * reproducible in the SQL oracle (parity with ngramJaccard asserted in
    * DedupSpec). */
  def minhashLsh(s: SparkSession, d: String): DataFrame = {
    val docs = withShingles(s, d).filter(size(col("sh")) > 0)
    val sig = docs.withColumn("sig",
      transform(sequence(lit(0), lit(63)),
        i => array_min(transform(col("sh"),
          sg => pmod((i * 2 + 1) * pmod(xxhash64(sg), lit(P)) + i * 97, lit(P))))))
    val bands = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => aggregate(slice(col("sig"), b * 4 + 1, lit(4)), lit(0L),
          (acc, v) => pmod(acc * 1000003L + v, lit(P))))).as(Seq("b_idx", "b_hash")))
    val cands = bands.select(col("doc_id").as("doc_a"), col("b_idx"), col("b_hash"))
      .join(bands.select(col("doc_id").as("doc_b"), col("b_idx").as("i2"), col("b_hash").as("h2")),
        col("b_idx") === col("i2") && col("b_hash") === col("h2") && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val sets = docs.select(col("doc_id"), col("sh"))
    cands
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double")
          / (size(col("sha")) + size(col("shb")) - col("inter"))).as("jaccard"))
      .orderBy(desc("jaccard"), asc("doc_a"), asc("doc_b"))
  }

  // ---- SimHash -------------------------------------------------------------
  /** 64-bit SimHash over token hashes (bit k set iff more than half the
    * tokens have bit k set). Near-dup mining joins on equality of one of
    * four 16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk equal) — see
    * DedupSpec; this entry emits the per-doc signature table. */
  def simhash(s: SparkSession, d: String): DataFrame = {
    val toksCol = tokens(col("text"))
    val hs = transform(toksCol, t => xxhash64(t))
    val nTok = size(toksCol).cast("long")
    // shiftright/shiftleft Scala wrappers only take Int shift amounts; the
    // underlying SQL functions accept a column — call them by name.
    val bits = transform(sequence(lit(0), lit(63)),
      k => when(
        aggregate(hs, lit(0L),
          (acc, h) => acc + call_function("shiftright", h, k).bitwiseAND(1L)) * 2 > nTok,
        call_function("shiftleft", lit(1L), k)).otherwise(lit(0L)))
    Tables.documents(s, d)
      .select(col("doc_id"),
        aggregate(bits, lit(0L), (acc, b) => acc.bitwiseOR(b)).as("simhash"),
        nTok.as("n_tokens"))
  }

  // ---- embedding near-dup (LSH-bucketed cosine) ---------------------------
  /** Top-20 same-bucket pairs by cosine over embeddings: the 8-bit sign
    * bucket bounds candidates (never O(n²)); exact cosine ranks them. */
  def embeddingCosine(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .withColumn("nrm", norm(col("embedding")))
      .withColumn("bucket", signBucket(col("embedding"), 8))
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      col("nrm").as("na"), col("bucket"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      col("nrm").as("nb"), col("bucket").as("bucket_b"))
    a.join(b, col("bucket") === col("bucket_b") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("bucket"),
        round(cosine(col("ea"), col("eb"), col("na"), col("nb")), 4).as("score"))
      .orderBy(desc("score"), asc("vec_a"), asc("vec_b"))
      .limit(20)
  }

  private val embeddingCosineSql =
    s"""WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm,
       |  ${signBucketSql("embedding", 8)} AS bucket FROM embeddings)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket,
       | round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 4) AS score
       |FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |ORDER BY score DESC, vec_a, vec_b LIMIT 20""".stripMargin

  override def entries: Seq[(String, QueryFn, Option[String])] = Seq(
    ("dedup_exact", exact _, Some(exactSql)),
    ("dedup_ngram_jaccard", ngramJaccard _, Some(ngramJaccardSql)),
    ("dedup_minhash_lsh", minhashLsh _, None),
    ("dedup_simhash", simhash _, None),
    ("dedup_embedding_cosine", embeddingCosine _, Some(embeddingCosineSql)))
}
