package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-gram extraction kernels, shared by the interpreted and the
  * generated code paths (codegen calls the static forwarders).
  *
  * Why these exist (SURVEY.md §4b escalation rule): the equivalent
  * DataFrame form — `array_distinct(transform(sequence(...), substr ...))`
  * — is a higher-order-function chain, which Spark evaluates INTERPRETED
  * per element (CodegenFallback). At sf0.1 that one expression cost ~2 s
  * per corpus pass and dominated text_langid / dedup_minhash /
  * dedup_simhash. A tight JVM loop is >10× faster and keeps the
  * surrounding projection inside whole-stage codegen.
  *
  * Both kernels preserve first-occurrence order, matching
  * `array_distinct`'s contract (order is not semantically load-bearing
  * downstream — profiles groupBy, signatures min-fold — but bit-parity
  * with the old form keeps plan diffs trivial to audit).
  *
  * Char positions are Java-char based; the corpus is ASCII (TESTDATA.md)
  * so this equals Spark's code-point `substr` everywhere it's used.
  */
object NGramKernels {
  /** Distinct character n-grams of `s`, first-occurrence order; empty
    * array when the string is shorter than n. Counts CODE POINTS like
    * Spark's `substr` and the DuckDB oracles do — the fast path indexes
    * UTF-16 chars directly and is taken whenever the string has no
    * surrogate pairs (always, for the ASCII corpus); astral-plane chars
    * fall back to a code-point offset table instead of silently
    * splitting surrogates.
    */
  def charNGrams(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    val nCp = str.codePointCount(0, len)
    if (nCp < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](math.min(len, 1024))
    if (nCp == len) { // no surrogates: char index == code-point index
      var i = 0
      while (i <= len - n) { seen.add(str.substring(i, i + n)); i += 1 }
    } else {
      val off = new Array[Int](nCp + 1)
      var ci = 0
      var cp = 0
      while (ci < len) { off(cp) = ci; ci = str.offsetByCodePoints(ci, 1); cp += 1 }
      off(nCp) = len
      var i = 0
      while (i <= nCp - n) { seen.add(str.substring(off(i), off(i + n))); i += 1 }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Distinct n-word shingles (single-space tokenization, shingle words
    * re-joined with a single space), first-occurrence order; empty array
    * for docs with fewer than n words. Tokenization matches
    * `split(text, " ")` with Spark's keep-trailing-empties limit = -1.
    */
  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val words = s.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](words.length)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Winnowed fingerprints (the MOSS selection, Schleimer et al.):
    * polynomial hashes h_i = Σ cp_j·31^(k−1−j) mod 1e9+7 of every
    * k-CODE-POINT gram — computed by ROLLING update, O(len) not
    * O(len·k) (the interpreted higher-order-function form measured
    * 36 s at sf0.1; this kernel replaces it) — then the minimum of
    * each w-window of consecutive hashes via a monotonic deque, ties
    * keeping the leftmost (= the window min VALUE — identical to the
    * oracle's list_min, which is all that survives the distinct).
    * Emits the DISTINCT selected hashes sorted ascending. The hash
    * matches the SQL left fold `(a*31 + ord(cp)) % p` exactly, so the
    * positional DuckDB oracle replicates it.
    */
  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    // Code points (ord() semantics — ASCII corpus takes the fast path,
    // astral chars still count as one position like the oracle).
    val cps: Array[Int] =
      if (str.codePointCount(0, len) == len) {
        val a = new Array[Int](len)
        var i = 0
        while (i < len) { a(i) = str.charAt(i).toInt; i += 1 }
        a
      } else str.codePoints().toArray
    val n = cps.length
    val nh = n - k + 1
    if (nh < w) return new GenericArrayData(Array.empty[Any])
    val P = 1000000007L
    // 31^(k-1) mod P for the rolling subtract
    var pow = 1L
    var e = 0
    while (e < k - 1) { pow = pow * 31 % P; e += 1 }
    val hs = new Array[Long](nh)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * 31 + cps(i)) % P; i += 1 }
    hs(0) = h
    i = 1
    while (i < nh) {
      h = ((h + P * 128 - cps(i - 1) * pow % P) % P * 31 + cps(i + k - 1)) % P
      hs(i) = h
      i += 1
    }
    // Sliding-window minimum, monotonic deque of indices (ties keep
    // the rightmost occurrence — only the min VALUE matters here,
    // identical to the oracle's list_min).
    val sel = new java.util.TreeSet[java.lang.Long]()
    val dq = new Array[Int](nh)
    var head = 0
    var tail = 0 // dq[head until tail]
    i = 0
    while (i < nh) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) sel.add(hs(dq(head)))
      i += 1
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  /** |A ∩ B| for two sorted-ascending UTF8String arrays (two-pointer). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }
}

/** `graft_intersect_size(a, b)` → int: |A ∩ B| for two SORTED-ascending
  * string arrays (each already a set), via a linear two-pointer merge —
  * no per-row hash set like the generic `array_intersect`, which
  * dominated the exact-Jaccard verify step (~4 s for 113 k pairs at
  * sf0.1; the merge is ~10× cheaper). Sortedness is the caller's
  * contract (`sort_array` uses the same UTF8String binary order the
  * merge compares with).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_intersect_size expects array<string> args, got ${l.sql} / ${r.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    NGramKernels.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.NGramKernels.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectSize =
    copy(left = l, right = r)
}

/** `graft_trigrams(text)` → array<string>: distinct char 3-grams. */
case class CharNGrams(child: Expression, n: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_trigrams expects string, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    NGramKernels.charNGrams(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NGramKernels.charNGrams($c, $n);")

  override protected def withNewChildInternal(c: Expression): CharNGrams = copy(child = c)
}

/** `graft_winnow(text, k, w)` → array<long>: distinct winnowed
  * fingerprints (sorted ascending) — see NGramKernels.winnow.
  */
case class WinnowedPrints(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_winnow expects string, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    NGramKernels.winnow(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NGramKernels.winnow($c, $k, $w);")

  override protected def withNewChildInternal(c: Expression): WinnowedPrints = copy(child = c)
}

/** `graft_shingles(text)` → array<string>: distinct 5-word shingles. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_shingles expects string, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    NGramKernels.wordShingles(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NGramKernels.wordShingles($c, $n);")

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}
