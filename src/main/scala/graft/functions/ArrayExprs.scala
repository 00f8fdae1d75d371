package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the similarity/dedup hot paths.
  *
  * Spark's higher-order functions (`transform`/`aggregate`) are evaluated
  * interpreted (CodegenFallback with per-element lambda dispatch) — measured
  * ~4k lambda evals/sec on this box, which made the HOF formulations of
  * MinHash and cosine scoring 100–1000× slower than necessary. These
  * expressions do the same math as a tight loop per row; `cosine_sim`
  * additionally participates in whole-stage codegen (`doGenCode`) because
  * it sits inside the pair-scoring inner loop of ANN/near-dup joins.
  */

/** Shared analysis-time guard for the user-callable graft functions whose
  * tuning parameters (shingle size, permutation/band counts, LSH bits…)
  * are read ONCE via `eval(InternalRow.empty)` and baked into the per-row
  * loop: such an argument must be a foldable integer, or evaluation would
  * hit an unbound attribute (column argument) or bake in
  * `null.asInstanceOf[Int] == 0` (NULL literal) and silently emit bogus
  * results. Failing in `checkInputDataTypes` turns both into a clear
  * AnalysisException at plan time instead.
  */
private[functions] object ExprChecks {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.IntegerType

  def foldableInt(e: Expression, fn: String, arg: String,
      minValue: Int = 1): TypeCheckResult =
    if (!e.foldable || e.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$fn: $arg must be a foldable INT literal, got ${e.sql}")
    else e.eval(InternalRow.empty) match {
      case null => TypeCheckResult.TypeCheckFailure(
        s"$fn: $arg must not be NULL")
      case v: Int if v < minValue => TypeCheckResult.TypeCheckFailure(
        s"$fn: $arg must be >= $minValue, got $v")
      case _ => TypeCheckResult.TypeCheckSuccess
    }

  def all(checks: TypeCheckResult*): TypeCheckResult =
    checks.find(!_.isSuccess).getOrElse(TypeCheckResult.TypeCheckSuccess)
}

/** cosine_sim(array<double>, array<double>) → double.
  *
  * Sequential fold in element order, `dot / (sqrt(nx) * sqrt(ny))` — the
  * exact IEEE op sequence the DuckDB oracle's `list_cosine_similarity`
  * produces, so rounded comparisons are bit-stable cross-engine.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers guarantee array<double> inputs (AbstractDataType is
  // private[sql], so ExpectsInputTypes is unavailable out-of-package)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** minhash_bands(shingles array<string>, numPerms int, numBands int) →
  * array<long> of LSH band hashes.
  *
  * One pass per row: a `numPerms`-permutation MinHash signature (perm p =
  * xxhash64 of the shingle bytes with seed p), then `numBands` band hashes
  * (xxhash64-chained over each signature slice). Banding/bucketing turns
  * near-dup detection into an equi-join on the band hash — the only
  * all-corpus operation is a shuffle keyed by bucket, never an all-pairs
  * product (SURVEY §7 milestone 4's 100 TB constraint).
  */
case class MinHashBands(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val each = ExprChecks.all(
      ExprChecks.foldableInt(second, prettyName, "numPerms"),
      ExprChecks.foldableInt(third, prettyName, "numBands"))
    if (!each.isSuccess) each
    else {
      // the banding relation, not just each value: numBands > numPerms
      // makes rowsPerBand 0 (every band hash 0 → every document collides
      // in every bucket, silently degrading the LSH join to all-pairs);
      // a non-divisible split silently ignores trailing permutations
      val perms = second.eval(InternalRow.empty).asInstanceOf[Int]
      val bands = third.eval(InternalRow.empty).asInstanceOf[Int]
      if (perms % bands != 0)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: numPerms ($perms) must be a multiple of numBands ($bands)")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  private lazy val numPerms: Int =
    second.eval(InternalRow.empty).asInstanceOf[Int]
  private lazy val numBands: Int =
    third.eval(InternalRow.empty).asInstanceOf[Int]

  override def nullSafeEval(arr: Any, np: Any, nb: Any): Any = {
    val shingles = arr.asInstanceOf[ArrayData]
    val n = shingles.numElements()
    val sig = new Array[Long](numPerms)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      var p = 0
      while (p < numPerms) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, p.toLong)
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    val rowsPerBand = numPerms / numBands
    val bands = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var h = 0L
      var r = 0
      while (r < rowsPerBand) {
        h = XXH64.hashLong(sig(b * rowsPerBand + r), h)
        r += 1
      }
      bands(b) = h
      b += 1
    }
    new GenericArrayData(bands)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** lsh_bucket(v array<double>, numBits int, table int) → long.
  *
  * Random-hyperplane LSH signature: `numBits` planes whose components are
  * deterministic pseudo-randoms in [-1, 1] derived from xxhash64 of
  * (table, plane, dim); bit p = sign(v · plane_p). Vectors in the same
  * bucket are cosine-close with high probability, so ANN becomes a bucket
  * equi-join + exact re-rank — the scale path when the query set cannot
  * broadcast.
  */
case class HyperplaneBucket(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprChecks.all(
      ExprChecks.foldableInt(second, prettyName, "numBits"),
      ExprChecks.foldableInt(third, prettyName, "table", minValue = 0))

  private lazy val numBits: Int = second.eval(InternalRow.empty).asInstanceOf[Int]
  private lazy val table: Int = third.eval(InternalRow.empty).asInstanceOf[Int]

  override def nullSafeEval(arr: Any, nb: Any, tb: Any): Any = {
    val v = arr.asInstanceOf[ArrayData]
    val dim = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < numBits) {
      var dot = 0.0
      var j = 0
      while (j < dim) {
        val h = XXH64.hashLong((table.toLong << 32) | (p.toLong << 16) | j.toLong, 42L)
        val w = ((h % 1001L + 1001L) % 1001L - 500L).toDouble / 500.0
        dot += v.getDouble(j) * w
        j += 1
      }
      bucket = bucket * 2 + (if (dot >= 0) 1L else 0L)
      p += 1
    }
    bucket
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** fingerprint(text string, window int) → string.
  *
  * Winnowing-lite document fingerprint: the minimum md5 (hex) over every
  * `window`-character sliding window of the text — shift-invariant, one
  * tight loop per row. Replaces the `array_min(transform(sequence(…),
  * i -> md5(substring(…))))` HOF formulation, whose per-window interpreted
  * lambda dispatch runs at the ~4k evals/sec cliff documented above: one
  * md5 per character of a 100 TB corpus must not pay a lambda each.
  * Digests are compared as raw bytes (unsigned) — identical ordering to
  * comparing the lowercase-hex strings, so results match the SQL form and
  * the DuckDB oracle exactly.
  */
case class Fingerprint(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "fingerprint"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprChecks.foldableInt(right, prettyName, "window")

  private lazy val window: Int =
    right.eval(InternalRow.empty).asInstanceOf[Int]

  // one digest instance per task deserialization; eval is single-threaded
  // within a task
  @transient private lazy val md5 = java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(t: Any, w: Any): Any = {
    val text = t.asInstanceOf[UTF8String]
    val nChars = text.numChars()
    val nWindows = math.max(nChars - window + 1, 1)
    var best: Array[Byte] = null
    var i = 0
    while (i < nWindows) {
      // substringSQL is 1-based and character-indexed, like SQL SUBSTRING
      val bytes = text.substringSQL(i + 1, window).getBytes
      md5.reset()
      val d = md5.digest(bytes)
      if (best == null || unsignedLess(d, best)) best = d
      i += 1
    }
    val hex = new java.lang.StringBuilder(32)
    var j = 0
    while (j < best.length) {
      hex.append(Character.forDigit((best(j) >> 4) & 0xf, 16))
      hex.append(Character.forDigit(best(j) & 0xf, 16))
      j += 1
    }
    UTF8String.fromString(hex.toString)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    a.length < b.length
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** simhash32(words array<string>) → long.
  *
  * 32-bit SimHash signature: every word votes ±1 on each of 32 bit
  * positions according to the bits of the first 8 hex chars of its md5;
  * bit p of the result is 1 when the vote total is >= 0. Bit p's vote
  * comes from hex digit p/4, bit p%4 — the exact layout of the SQL
  * formulation (`instr('0123456789abcdef', substring(md5(w), p div 4 + 1,
  * 1)) - 1` then `div 2^(p%4) % 2`), so results are bit-identical to the
  * DuckDB oracle. Replaces a 32×-per-word explode + two shuffles
  * (doc×pos, then doc) with one per-row loop and NO shuffle at all —
  * the difference between a signature scan and a multi-TB exchange at
  * corpus scale.
  */
case class SimHash32(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  @transient private lazy val md5 = java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(arr: Any): Any = {
    val words = arr.asInstanceOf[ArrayData]
    val votes = new Array[Int](32)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null) {
        md5.reset()
        val d = md5.digest(w.getBytes)
        var pos = 0
        while (pos < 32) {
          // hex char index pos/4 → byte pos/8, high nibble for even chars
          val c = pos >> 2
          val b = d(c >> 1) & 0xff
          val digit = if ((c & 1) == 0) b >> 4 else b & 0xf
          votes(pos) += 2 * ((digit >> (pos & 3)) & 1) - 1
          pos += 1
        }
      }
      i += 1
    }
    var hash = 0L
    var pos = 0
    while (pos < 32) {
      if (votes(pos) >= 0) hash |= 1L << pos
      pos += 1
    }
    hash
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** word_shingles(text string, n int) → array<string> of DISTINCT word
  * `n`-gram shingles (words = single-space split, shingle = n consecutive
  * words re-joined with a space, first-occurrence order). Equivalent to
  * the `array_distinct(transform(sequence(1, size(words)-n+1), i ->
  * concat_ws(' ', …)))` HOF formulation but one tight loop per row:
  * Spark's higher-order functions are CodegenFallback with per-element
  * lambda dispatch (~4k evals/sec measured, header comment), and
  * shingling runs per WORD of the corpus — the q35/q51/q56 hot path must
  * not pay a lambda each. Texts with fewer than `n` words yield an empty
  * array (callers filter those docs, as the HOF form's `size >= n` guard
  * did).
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprChecks.foldableInt(right, prettyName, "n")

  private lazy val n: Int = right.eval(InternalRow.empty).asInstanceOf[Int]

  override def nullSafeEval(t: Any, nn: Any): Any =
    WordShingles.compute(t.asInstanceOf[UTF8String], n)

  // static-invoke codegen: the shingling loop runs as one static call
  // from inside the generated whole-stage loop (no per-row virtual eval
  // dispatch, no codegen fallback barrier around the projection); `n` is
  // analysis-checked foldable and baked in as a constant
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.WordShingles.compute($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordShingles {
  /** First-occurrence-order dedup over the ONE shared gram kernel
    * ([[WordNgrams.compute]] — tokenization with limit -1, trailing empty
    * tokens kept, identical to split(text, ' ')). The two functions agree
    * by construction because this IS the other kernel plus a set. */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val grams = WordNgrams.compute(text, n)
    val total = grams.numElements()
    val seen = new java.util.LinkedHashSet[Any](total * 2)
    var i = 0
    while (i < total) { seen.add(grams.array(i)); i += 1 }
    if (seen.size == total) return grams // no dups: reuse the array
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

/** word_ngrams(text string, n int) → array<string> of ALL word n-grams in
  * order WITH multiplicity — the counting sibling of [[WordShingles]]
  * (which dedups for set-similarity): repetition-quality metrics (q74 top
  * n-gram fraction) need every occurrence. Same rationale as
  * word_shingles: a `transform(sequence(...), ...)` HOF pays interpreted
  * lambda dispatch per GRAM of the corpus (measured: q74's bigram
  * construction dominated the query, ~8 s of 9 at sf0.1); this is one
  * static call per row inside whole-stage codegen. Texts with fewer than
  * `n` words yield an empty array.
  */
case class WordNgrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprChecks.foldableInt(right, prettyName, "n")

  private lazy val n: Int = right.eval(InternalRow.empty).asInstanceOf[Int]

  override def nullSafeEval(t: Any, nn: Any): Any =
    WordNgrams.compute(t.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.WordNgrams.compute($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordNgrams {
  /** Same tokenization as split(text, ' ') with limit -1 (trailing empty
    * tokens kept), same gram text as WordShingles — minus the dedup. */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](words.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** top_gram_frac(text string, n int) → double: the fraction of the
  * document's word n-grams taken by its most frequent n-gram (Gopher-style
  * repetition metric). Mode-of-ngrams is a PER-DOCUMENT statistic — the
  * explode → groupBy(doc_id, gram) → groupBy(doc_id) spelling shuffles the
  * whole corpus twice to compute something each row can answer alone; this
  * expression runs a per-row count inside whole-stage codegen, zero
  * exchanges (measured: q74 dropped from 4 exchanges + 3 joins to a single
  * scan). Returns 0.0 for texts with fewer than `n` words.
  */
case class TopGramFrac(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "top_gram_frac"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprChecks.foldableInt(right, prettyName, "n")

  private lazy val n: Int = right.eval(InternalRow.empty).asInstanceOf[Int]

  override def nullSafeEval(t: Any, nn: Any): Any =
    TopGramFrac.compute(t.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.TopGramFrac.compute($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TopGramFrac {
  /** Counts over the [[WordNgrams]] kernel's output (same tokenization and
    * gram text — the two functions agree by construction). */
  def compute(text: UTF8String, n: Int): Double = {
    val grams = WordNgrams.compute(text, n)
    val total = grams.numElements()
    if (total == 0) return 0.0
    val counts = new java.util.HashMap[Any, Integer](total * 2)
    var max = 0
    var i = 0
    while (i < total) {
      val g = grams.array(i)
      val c = counts.merge(g, 1, (a, b) => a + b)
      if (c > max) max = c
      i += 1
    }
    max.toDouble / total
  }
}

/** intersect_size(a array<string>, b array<string>) → int, REQUIRING both
  * arrays sorted ascending (Spark's UTF8String binary order — what
  * `array_sort` produces): one merge walk, no per-pair hash set.
  *
  * The near-dup VERIFY hot path computes |a ∩ b| once per CANDIDATE PAIR
  * — at corpus scale that is orders of magnitude more evaluations than
  * rows. Spark's `array_intersect` builds a hash set of one side per
  * evaluation and materializes the intersection ARRAY just to take its
  * size (measured: the verify join dominated q56 end-to-end, 20 s of a
  * 27 s pipeline at 371 k candidates). Sorting each document's shingle
  * set ONCE (per doc, not per pair) converts every pair evaluation into
  * an allocation-free two-pointer walk.
  */
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_size"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.StringType
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) |
           (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<string> or two array<long> " +
          s"arguments, got ${l.simpleString} and ${r.simpleString}")
    }
  }

  private def longElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    if (longElems)
      IntersectSize.computeLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      IntersectSize.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // static-invoke codegen, same shape as word_shingles: the merge walk
  // runs as one static call inside the whole-stage loop; the kernel is
  // chosen at PLAN time from the element type (string vs hashed long)
  override def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val kernel = if (longElems) "computeLong" else "compute"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectSize.$kernel($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectSize {
  /** Two-pointer intersection count over ascending (UTF8String binary
    * order) string arrays — the kernel shared by eval and codegen. */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  /** Same walk over ascending long arrays (hashed token sets — see
    * [[Hash64Sorted]]): no string materialization per element at all. */
  def computeLong(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}

/** hash64_sorted(tokens array<string>) → array<long>: xxhash64 of each
  * token, sorted ascending — the compact representation the exact
  * near-dup pipeline ([[graft.operators.NearDup.exactPairs]]) runs on.
  *
  * Why: the PPJoin's postings, candidate join keys, and above all the
  * VERIFICATION join payload were string shingle arrays (~1.2 KB/doc at
  * the driver corpus). At base scale the verify join broadcasts and none
  * of that moves; at 100× corpus scale it becomes a sort-merge join and
  * the intermediate — every candidate pair dragging one side's full
  * string array through the doc_b exchange — measured 8.2 GB of an
  * 11.8 GB total shuffle. Hashed-to-long sets cut the per-doc payload
  * ~3×, shrink every join key from ~24-byte strings to 8 bytes, and turn
  * the per-pair verify walk into long compares. Set semantics are
  * preserved modulo 64-bit collisions (P ≈ n²/2⁶⁴ per doc — ~1e-13 at
  * 52 tokens; the q56 oracle stays hash-green) — the standard PPJoin
  * token-id trick, done with a hash instead of a dictionary build.
  */
case class Hash64Sorted(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hash64_sorted"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"$prettyName expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(arr: Any): Any =
    Hash64Sorted.compute(arr.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Hash64Sorted.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hash64Sorted {
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      out(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
}

/** token_histogram(tokens array<string>, k int) → binary (k bytes):
  * counts of the doc's tokens hashed into k byte buckets (saturating at
  * 255) — the doc-level sketch behind the EXACT overlap upper bound in
  * the PPJoin hot-token path ([[graft.operators.NearDup.exactCandidates]]).
  * For any two docs, |A ∩ B| ≤ Σᵢ min(histA[i], histB[i]): each common
  * token lands in the same bucket on both sides, and saturation only ever
  * RAISES a count, so the bound stays an upper bound — rejecting a
  * candidate below the threshold's overlap requirement can never lose a
  * true pair. One pass per DOC (not per pair); the per-pair side is
  * [[OverlapBound]].
  *
  * Bucket count vs payload: discrimination needs k ≳ several× the doc's
  * token count (at k ≈ n/2 the random-collision floor of Σmin sits near
  * the overlap requirement and nothing prunes — measured on the 100×
  * probe with k=32 over ~52-token docs). Byte buckets keep k=256 at a
  * 256-byte posting payload, ~4× smaller than an int-array histogram.
  */
case class TokenHistogram(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "token_histogram"

  // docs with more tokens than a byte bucket can count yield NULL (see
  // the kernels) — consumers must treat a NULL sketch as "no bound"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprChecks.all(
      ExprChecks.foldableInt(right, prettyName, "k"),
      left.dataType match {
        case ArrayType(org.apache.spark.sql.types.StringType, _) |
             ArrayType(LongType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$prettyName expects array<string> or array<long> tokens, got ${other.simpleString}")
      })

  private lazy val k: Int = right.eval(InternalRow.empty).asInstanceOf[Int]

  private def longElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(arr: Any, kAny: Any): Any =
    if (longElems) TokenHistogram.computeLong(arr.asInstanceOf[ArrayData], k)
    else TokenHistogram.compute(arr.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = if (longElems) "computeLong" else "compute"
    // the kernel decides post-call nullness (oversized doc → null sketch)
    nullSafeCodeGen(ctx, ev, (a, _) => s"""
      ${ev.value} = graft.functions.TokenHistogram.$kernel($a, $k);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TokenHistogram {
  /** Byte counts can only represent 0..255; a doc with more than 255
    * tokens could overflow a bucket, and a clamped count would UNDERCUT
    * the bound (min(255, 255) < true min when both sides exceed 255 in a
    * bucket) — exactly the silent pair-drop the bound must never cause.
    * Such docs yield NULL: no sketch, no filter, the pair goes straight
    * to exact verification. */
  private val MaxCountable = 255

  def compute(arr: ArrayData, k: Int): Array[Byte] = {
    val n = arr.numElements()
    if (n > MaxCountable) return null
    val counts = new Array[Byte](k)
    var i = 0
    while (i < n) {
      // UTF8String.hashCode is murmur over the bytes — deterministic for
      // a given string, which is all the doc-vs-doc comparison needs
      val b = java.lang.Math.floorMod(arr.getUTF8String(i).hashCode, k)
      counts(b) = (counts(b) + 1).toByte // cannot overflow: n <= 255
      i += 1
    }
    counts
  }

  /** Same bucketing over hashed-long token sets ([[Hash64Sorted]]). */
  def computeLong(arr: ArrayData, k: Int): Array[Byte] = {
    val n = arr.numElements()
    if (n > MaxCountable) return null
    val counts = new Array[Byte](k)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      val b = java.lang.Math.floorMod((h ^ (h >>> 32)).toInt, k)
      counts(b) = (counts(b) + 1).toByte
      i += 1
    }
    counts
  }
}

/** overlap_bound(a binary, b binary) → int: Σᵢ min(a[i], b[i]) over the
  * unsigned byte counts of two [[TokenHistogram]] sketches — the exact
  * upper bound on token overlap. Runs once per CANDIDATE match event
  * inside the PPJoin's join condition — codegen'd static call, no
  * allocation. */
case class OverlapBound(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "overlap_bound"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.BinaryType
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two binary sketches " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString} given)")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    OverlapBound.compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.OverlapBound.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object OverlapBound {
  def compute(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0; var s = 0
    while (i < n) {
      s += math.min(a(i) & 0xff, b(i) & 0xff)
      i += 1
    }
    s
  }
}

/** interleave_bits(c0 int, c1 int[, c2 int[, c3 int]]) → long Morton code.
  *
  * Interleaves the low 16 bits of 2–4 integer codes into one long, the
  * Z-order curve key: sorting by it gives every run of rows (hence every
  * written file) a small hyper-rectangle in code space, so file-level
  * min/max stats prune on EACH interleaved column independently —
  * lexicographic range-clustering only ever prunes on the leading column.
  * Nulls code as 0 and cluster with the minimum.
  */
case class InterleaveBits(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.size >= 2 && children.size <= 4,
    "interleave_bits takes 2-4 columns")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "interleave_bits"

  override def eval(input: InternalRow): Any = {
    val n = children.size
    var z = 0L
    var c = 0
    while (c < n) {
      val v = children(c).eval(input)
      val code = if (v == null) 0 else v.asInstanceOf[Int] & 0xffff
      var bit = 0
      while (bit < 16) {
        z |= ((code >> bit) & 1L) << (bit * n + c)
        bit += 1
      }
      c += 1
    }
    z
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Idempotent session registration of the graft SQL functions. */
object Registry {
  def install(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("minhash_bands",
      (es: Seq[Expression]) => MinHashBands(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("lsh_bucket",
      (es: Seq[Expression]) => HyperplaneBucket(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("fingerprint",
      (es: Seq[Expression]) => Fingerprint(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash32",
      (es: Seq[Expression]) => SimHash32(es(0)), "built-in")
    reg.createOrReplaceTempFunction("interleave_bits",
      (es: Seq[Expression]) => InterleaveBits(es), "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      (es: Seq[Expression]) => WordShingles(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("word_ngrams",
      (es: Seq[Expression]) => WordNgrams(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("top_gram_frac",
      (es: Seq[Expression]) => TopGramFrac(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("trigram_lang",
      (es: Seq[Expression]) => TrigramLang(es(0)), "built-in")
    reg.createOrReplaceTempFunction("pq_encode",
      (es: Seq[Expression]) =>
        if (es.length == 3) PqEncodeResidual(es(0), es(1), es(2))
        else PqEncode(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("pq_decode",
      (es: Seq[Expression]) =>
        if (es.length == 3) PqDecodeResidual(es(0), es(1), es(2))
        else PqDecode(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("image_meta",
      (es: Seq[Expression]) => ImageMetaExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("html_to_text",
      (es: Seq[Expression]) => HtmlTextExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("docx_text",
      (es: Seq[Expression]) => DocxTextExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("mp4_meta",
      (es: Seq[Expression]) => Mp4MetaExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("epub_text",
      (es: Seq[Expression]) => EpubTextExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("pdf_text",
      (es: Seq[Expression]) => PdfTextExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("mp3_meta",
      (es: Seq[Expression]) => Mp3MetaExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("aac_meta",
      (es: Seq[Expression]) => AacMetaExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("ogg_meta",
      (es: Seq[Expression]) => OggMetaExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("id3_tags",
      (es: Seq[Expression]) => Id3TagsExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("mkv_meta",
      (es: Seq[Expression]) => MkvMetaExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("flac_meta",
      (es: Seq[Expression]) => FlacMetaExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("sniff_text",
      (es: Seq[Expression]) => SniffTextExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("url_parts",
      (es: Seq[Expression]) => UrlPartsExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("main_text",
      (es: Seq[Expression]) => MainTextExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("eml_text",
      (es: Seq[Expression]) => EmlTextExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("robots_allowed",
      (es: Seq[Expression]) => RobotsAllowedExpr(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("exif_meta",
      (es: Seq[Expression]) => ExifMetaExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("mbox_split",
      (es: Seq[Expression]) => MboxSplitExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("sitemap_urls",
      (es: Seq[Expression]) => SitemapUrlsExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("intersect_size",
      (es: Seq[Expression]) => IntersectSize(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("token_histogram",
      (es: Seq[Expression]) => TokenHistogram(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("overlap_bound",
      (es: Seq[Expression]) => OverlapBound(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("hash64_sorted",
      (es: Seq[Expression]) => Hash64Sorted(es(0)), "built-in")
    reg.createOrReplaceTempFunction("bitmap_distinct",
      (es: Seq[Expression]) =>
        BitmapDistinct(es(0)).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction("clean_text",
      (es: Seq[Expression]) => CleanTextExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("xlsx_text",
      (es: Seq[Expression]) => XlsxTextExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("pptx_text",
      (es: Seq[Expression]) => PptxTextExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("bpe_count",
      (es: Seq[Expression]) => BpeCountExpr(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("bpe_encode",
      (es: Seq[Expression]) => BpeEncodeExpr(es(0), es(1)), "built-in")
  }
}
