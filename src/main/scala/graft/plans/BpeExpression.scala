package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE token-count kernel (SURVEY.md §2.H, VERDICT r8 ask #7): per
  * row, whitespace-tokenize the text (the WordShingles sqlTokens
  * contract), apply the trained merge table to every word — two
  * leftmost-non-overlapping replace passes per merge rank, exactly
  * [[graft.functions.Bpe.rep2]] — and return the total subword count.
  * One codegen'd call per row (the WordNgrams pattern): no explode, no
  * shuffle; the merge table rides in as a reference object, the
  * broadcast-model shape of a 100 TB accounting job.
  *
  * A per-(merge-table, thread) word memo serves the Zipf head: the
  * corpus repeats its frequent words endlessly, and the application is a
  * pure function of the word, so the per-occurrence loop collapses to a
  * hash probe for all but first sightings. The memo is CAPPED at
  * [[BpeTokenCount.MemoCap]] entries — executor task threads are pooled
  * and outlive tasks, and an uncapped map would grow toward the full
  * observed vocabulary of a hapax-heavy 100 TB corpus (r9 review
  * finding); past the cap the Zipf head is already resident and tail
  * words just compute (which memoizing never helped anyway). */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING child, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_token_count"

  // stable per-instance arrays: the memo keys on pats' identity
  @transient private lazy val pats: Array[String] =
    merges.map(m => " " + m._1 + " ").toArray
  @transient private lazy val reps: Array[String] =
    merges.map(m => " " + m._2 + " ").toArray

  override def nullSafeEval(input: Any): Any =
    BpeTokenCount.compute(input.asInstanceOf[UTF8String], pats, reps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patsRef = ctx.addReferenceObj("bpePats", pats, "java.lang.String[]")
    val repsRef = ctx.addReferenceObj("bpeReps", reps, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.BpeTokenCount$$.MODULE$$.compute($c, $patsRef, $repsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** The subword STREAM sibling of [[BpeTokenCount]]: the document's BPE
  * token sequence as an array — what a shard writer / vocabulary view
  * consumes where the count kernel only does accounting. Same merge
  * semantics, same per-(table, thread) word memo (caching the split
  * subword arrays instead of counts). */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING child, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_tokens"

  @transient private lazy val pats: Array[String] =
    merges.map(m => " " + m._1 + " ").toArray
  @transient private lazy val reps: Array[String] =
    merges.map(m => " " + m._2 + " ").toArray

  override def nullSafeEval(input: Any): Any =
    BpeTokens.compute(input.asInstanceOf[UTF8String], pats, reps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patsRef = ctx.addReferenceObj("bpePats", pats, "java.lang.String[]")
    val repsRef = ctx.addReferenceObj("bpeReps", reps, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.BpeTokens$$.MODULE$$.compute($c, $patsRef, $repsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

object BpeTokens {
  private val memo = new ThreadLocal[
      java.util.WeakHashMap[AnyRef, java.util.HashMap[String, Array[UTF8String]]]] {
    override def initialValue() =
      new java.util.WeakHashMap[AnyRef, java.util.HashMap[String, Array[UTF8String]]]()
  }

  def compute(u: UTF8String, pats: Array[String], reps: Array[String])
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = WordShingles.sqlTokens(u.toString)
    val m = memo.get().computeIfAbsent(pats,
      _ => new java.util.HashMap[String, Array[UTF8String]]())
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        var subs = m.get(w)
        if (subs == null) {
          var s = graft.functions.Bpe.syms(w)
          var k = 0
          while (k < pats.length) {
            s = graft.functions.Bpe.rep2(s, pats(k), reps(k))
            k += 1
          }
          subs = s.substring(1, s.length - 1).split(" ", -1)
            .map(UTF8String.fromString)
          if (m.size < BpeTokenCount.MemoCap) m.put(w, subs)
        }
        var j = 0
        while (j < subs.length) { out += subs(j); j += 1 }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

object BpeTokenCount {
  /** Word-memo bound per (merge table, thread) — comfortably holds any
    * Zipf head while keeping pooled executor threads from accumulating a
    * corpus-sized vocabulary. */
  final val MemoCap = 1 << 16

  private val memo = new ThreadLocal[
      java.util.WeakHashMap[AnyRef, java.util.HashMap[String, java.lang.Long]]] {
    override def initialValue() =
      new java.util.WeakHashMap[AnyRef, java.util.HashMap[String, java.lang.Long]]()
  }

  def compute(u: UTF8String, pats: Array[String], reps: Array[String]): Long = {
    val words = WordShingles.sqlTokens(u.toString)
    val m = memo.get().computeIfAbsent(pats,
      _ => new java.util.HashMap[String, java.lang.Long]())
    var total = 0L
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        var c = m.get(w)
        if (c == null) {
          c = java.lang.Long.valueOf(applyWord(w, pats, reps))
          if (m.size < MemoCap) m.put(w, c)
        }
        total += c.longValue()
      }
      i += 1
    }
    total
  }

  /** Subword count of one word: symbolize, two replace passes per merge
    * rank, count symbols (spaces − 1 on the padded representation). */
  def applyWord(w: String, pats: Array[String], reps: Array[String]): Long = {
    var s = graft.functions.Bpe.syms(w)
    var k = 0
    while (k < pats.length) {
      s = graft.functions.Bpe.rep2(s, pats(k), reps(k))
      k += 1
    }
    var spaces = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') spaces += 1
      i += 1
    }
    spaces.toLong - 1L
  }
}
