package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-3-gram shingle kernel (SURVEY.md §2.H): each doc's DISTINCT
  * shingle set in one per-row loop, replacing the relational
  * posexplode + two window leads + distinct — which shuffles every TOKEN
  * of the corpus on doc_id just to read neighbors the token array already
  * holds adjacently. Feeds the whole near-dup index substrate (exact
  * Jaccard, MinHash-LSH, clusters, keep-list).
  *
  * Bit-identical contract: same tokenizer (split(trim(text), "\\s+") —
  * Java regex split, limit −1, exactly TextFunctions.tokens), same
  * space-joined grams, same per-doc distinct as the relational twin
  * (ShinglePropertySpec asserts set equality per doc, incl. non-ASCII);
  * the DuckDB oracle CTEs replay the same construction, so every dedup
  * oracle stays hash-green. */
case class WordShingles(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING child, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.WordShingles$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** COUNT-PRESERVING native word-n-gram kernel: every n-gram of the doc in
  * token order, duplicates kept — the multiset the distinct-set kernel
  * above cannot express. txt_repetition_score needs the bigram COUNT and
  * its distinct count (a pure per-row computation once the multiset is in
  * hand — no shuffle at all), and txt_top_ngrams needs the corpus multiset
  * (one map-side-combined shuffle on the gram). Both previously rebuilt
  * grams relationally (posexplode + window lead) — shuffling every token
  * of the corpus on doc_id just to read a neighbor the token array already
  * holds adjacently; this kernel finishes the lineage family the r4
  * winnow/shingle kernels started.
  *
  * Same bit-identical contract as WordShingles: sqlTrim/sqlTokens
  * tokenizer, space-joined grams; per-doc MULTISET equality with the
  * relational twin is asserted in ShinglePropertySpec. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"gram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING child, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.WordNgrams$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  def compute(u: UTF8String, n: Int): ArrayData = {
    val toks = WordShingles.sqlTokens(u.toString)
    val nG = toks.length - n + 1
    if (nG <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nG)
    var i = 0
    while (i < nG) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object WordShingles {
  final val N = 3 // gram size — matches the relational two-lead build

  /** SQL trim semantics: ASCII SPACES only — Java String.trim strips every
    * char <= U+0020 (tabs, newlines) and would silently change the token
    * stream of any doc with a trailing \n vs the relational twin/oracles.
    * Public so test models recompute with the SAME semantics. */
  def sqlTrim(s: String): String = {
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    s.substring(lo, hi)
  }

  /** The exact tokenizer of TextFunctions.tokens — SQL trim + regex split
    * with limit −1 (Spark's split KEEPS trailing empty tokens; Java's
    * default limit 0 drops them). */
  def sqlTokens(s: String): Array[String] = sqlTrim(s).split("\\s+", -1)

  def compute(u: UTF8String): ArrayData = {
    val toks = sqlTokens(u.toString)
    val nG = toks.length - N + 1
    if (nG <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](nG * 2)
    var i = 0
    while (i < nG) {
      seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}
