package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", PAMI 2011) for the IVF-PQ ANN path: the vector space
  * splits into M subspaces, each quantized by its own ksub-centroid
  * codebook, so a D-dim float vector stores as M bytes — the ~(8·D/M)×
  * payload cut that makes a 100 TB embedding corpus's candidate scan
  * memory-feasible. Encoding is argmin-L2 per subspace; reconstruction
  * concatenates the chosen centroids, and similarity against the
  * reconstruction (computed by the existing codegen'd `cosine_sim`) is
  * the asymmetric-distance approximation.
  *
  * The codebook travels as a base64 literal argument (parsed once per
  * expression instance, referenced directly from generated code — never
  * re-decoded per row). Training ([[trainPq]]) is deterministic Lloyd's
  * per subspace with index-strided init — no RNG, fixed sample → fixed
  * codes.
  */
object Pq {

  /** codebook(m)(k)(j): M subspaces × ksub centroids × subdim values. */
  type Codebook = Array[Array[Array[Double]]]

  def encodeCodebook(cb: Codebook): String = {
    val m = cb.length
    val ksub = cb(0).length
    val subdim = cb(0)(0).length
    val buf = java.nio.ByteBuffer.allocate(12 + 8 * m * ksub * subdim)
    buf.putInt(m).putInt(ksub).putInt(subdim)
    cb.foreach(_.foreach(_.foreach(buf.putDouble)))
    java.util.Base64.getEncoder.encodeToString(buf.array())
  }

  def decodeCodebook(b64: String): Codebook = {
    val buf = java.nio.ByteBuffer.wrap(java.util.Base64.getDecoder.decode(b64))
    val m = buf.getInt; val ksub = buf.getInt; val subdim = buf.getInt
    Array.fill(m, ksub, subdim)(buf.getDouble)
  }

  /** Deterministic per-subspace Lloyd's (L2 metric — PQ quantizes raw
    * subvectors): initial centroids are index-strided sample subvectors.
    * `ksub` is clamped to the sample size (a small corpus trains a small
    * codebook rather than failing). */
  def trainPq(sample: Array[Array[Double]], m: Int, ksub: Int,
      iters: Int): Codebook = {
    require(sample.nonEmpty, "PQ training sample is empty")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by M=$m subspaces")
    val subdim = dim / m
    val k = math.min(ksub, sample.length)
    Array.tabulate(m) { mi =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, mi * subdim, (mi + 1) * subdim))
      var cents = Array.tabulate(k)(i => sub(i * (sub.length / k)).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k)(new Array[Double](subdim))
        val counts = new Array[Int](k)
        sub.foreach { v =>
          val best = nearest(v, cents)
          counts(best) += 1
          var j = 0
          while (j < subdim) { sums(best)(j) += v(j); j += 1 }
        }
        cents = Array.tabulate(k)(c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c)))
        it += 1
      }
      cents
    }
  }

  private def nearest(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var j = 0
      val cc = cents(c)
      while (j < v.length) { val t = v(j) - cc(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** argmin-L2 code per subspace → M bytes (ksub ≤ 256). */
  def encode(v: ArrayData, cb: Codebook): Array[Byte] = {
    val m = cb.length
    val subdim = cb(0)(0).length
    val out = new Array[Byte](m)
    val sub = new Array[Double](subdim)
    var mi = 0
    while (mi < m) {
      var j = 0
      while (j < subdim) { sub(j) = v.getDouble(mi * subdim + j); j += 1 }
      out(mi) = nearest(sub, cb(mi)).toByte
      mi += 1
    }
    out
  }

  /** RESIDUAL encode — the actual IVF-PQ design (Jégou 2011 §III):
    * quantize `v − anchor` (the coarse cell centroid), whose spread is a
    * cell diameter instead of the whole space, so the same 8 bytes carry
    * far more precision. The anchor is re-added at decode. */
  def encodeResidual(v: ArrayData, anchor: ArrayData,
      cb: Codebook): Array[Byte] = {
    val m = cb.length
    val subdim = cb(0)(0).length
    val out = new Array[Byte](m)
    val sub = new Array[Double](subdim)
    var mi = 0
    while (mi < m) {
      var j = 0
      while (j < subdim) {
        val o = mi * subdim + j
        sub(j) = v.getDouble(o) - anchor.getDouble(o)
        j += 1
      }
      out(mi) = nearest(sub, cb(mi)).toByte
      mi += 1
    }
    out
  }

  /** Concatenated-centroid reconstruction of an M-byte code. */
  def decode(codes: Array[Byte], cb: Codebook): GenericArrayData = {
    val m = cb.length
    val subdim = cb(0)(0).length
    val out = new Array[Any](m * subdim)
    var mi = 0
    while (mi < m) {
      val cent = cb(mi)(codes(mi) & 0xff)
      var j = 0
      while (j < subdim) { out(mi * subdim + j) = cent(j); j += 1 }
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** Residual reconstruction: anchor + the coded residual. */
  def decodeResidual(codes: Array[Byte], anchor: ArrayData,
      cb: Codebook): GenericArrayData = {
    val m = cb.length
    val subdim = cb(0)(0).length
    val out = new Array[Any](m * subdim)
    var mi = 0
    while (mi < m) {
      val cent = cb(mi)(codes(mi) & 0xff)
      var j = 0
      while (j < subdim) {
        val o = mi * subdim + j
        out(o) = anchor.getDouble(o) + cent(j)
        j += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  private[functions] def foldableCodebook(e: Expression, fn: String)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.StringType
    if (!e.foldable || e.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$fn: codebook must be a foldable STRING literal")
    else TypeCheckResult.TypeCheckSuccess
  }
}

/** pq_encode(v array<double>, codebook string) → binary (M bytes). */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    Pq.foldableCodebook(right, prettyName)

  @transient private lazy val cb: Pq.Codebook =
    Pq.decodeCodebook(right.eval(
      org.apache.spark.sql.catalyst.InternalRow.empty).toString)

  override def nullSafeEval(v: Any, c: Any): Any =
    Pq.encode(v.asInstanceOf[ArrayData], cb)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = graft.functions.Pq.encode($v, $cbRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** pq_encode(v array<double>, anchor array<double>, codebook string) →
  * binary: residual encoding against the coarse-cell anchor. */
case class PqEncodeResidual(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    Pq.foldableCodebook(third, prettyName)

  @transient private lazy val cb: Pq.Codebook =
    Pq.decodeCodebook(third.eval(
      org.apache.spark.sql.catalyst.InternalRow.empty).toString)

  override def nullSafeEval(v: Any, a: Any, c: Any): Any =
    Pq.encodeResidual(v.asInstanceOf[ArrayData], a.asInstanceOf[ArrayData], cb)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, (v, a, _) =>
      s"${ev.value} = graft.functions.Pq.encodeResidual($v, $a, $cbRef);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** pq_decode(codes binary, anchor array<double>, codebook string) →
  * array<double>: anchor + coded residual. */
case class PqDecodeResidual(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_decode"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    Pq.foldableCodebook(third, prettyName)

  @transient private lazy val cb: Pq.Codebook =
    Pq.decodeCodebook(third.eval(
      org.apache.spark.sql.catalyst.InternalRow.empty).toString)

  override def nullSafeEval(c: Any, a: Any, cbArg: Any): Any =
    Pq.decodeResidual(c.asInstanceOf[Array[Byte]], a.asInstanceOf[ArrayData], cb)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, (c, a, _) =>
      s"${ev.value} = graft.functions.Pq.decodeResidual($c, $a, $cbRef);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** pq_decode(codes binary, codebook string) → array<double>. */
case class PqDecode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_decode"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    Pq.foldableCodebook(right, prettyName)

  @transient private lazy val cb: Pq.Codebook =
    Pq.decodeCodebook(right.eval(
      org.apache.spark.sql.catalyst.InternalRow.empty).toString)

  override def nullSafeEval(c: Any, cbArg: Any): Any =
    Pq.decode(c.asInstanceOf[Array[Byte]], cb)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, (c, _) =>
      s"${ev.value} = graft.functions.Pq.decode($c, $cbRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
