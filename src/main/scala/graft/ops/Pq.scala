package graft.ops

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, BinaryExpression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.geo.sql.GeoExpression

/** Product-quantization kernels for the persisted ANN index: an embedding
  * splits into `m` subspaces of `dsub` dims; each subspace quantizes to one
  * of 256 codebook centroids, so a vector stores as m BYTES (+ one float
  * reconstruction norm) instead of dim floats — the memory wall of a raw
  * inverted file at 100 TB. Queries score candidates by ASYMMETRIC DISTANCE
  * (ADC): one m x 256 dot-product LUT per query, then each candidate is m
  * table lookups — never a vector re-attach.
  *
  * Codebook layout everywhere: flattened m x 256 x dsub floats with a FIXED
  * 256 stride; a subspace trained with fewer than 256 centroids pads by
  * repeating its first entry (a padded duplicate can never win the strict
  * argmin, so padding is inert).
  */
object PqKernels {

  /** Encode one vector: per-subspace argmin-L2 code + the reconstruction
    * norm in one pass → (code: Array[Byte], rnorm: Double). With a non-null
    * `base` (RESIDUAL encoding — `vec` is v − c_list), the norm is
    * ||base + recon(code)|| — the norm of the full reconstructed vector the
    * ADC scorer divides by. */
  def encode(vec: ArrayData, books: Array[Float], m: Int, dsub: Int,
             base: ArrayData): InternalRow = {
    val code = new Array[Byte](m)
    var rn = 0.0
    var j = 0
    while (j < m) {
      var best = Double.MaxValue
      var bi   = 0
      var c = 0
      while (c < 256) {
        val off = (j * 256 + c) * dsub
        var acc = 0.0
        var d = 0
        while (d < dsub) {
          val diff = vec.getFloat(j * dsub + d).toDouble - books(off + d)
          acc += diff * diff
          d += 1
        }
        if (acc < best) { best = acc; bi = c }
        c += 1
      }
      code(j) = bi.toByte
      val off = (j * 256 + bi) * dsub
      var d = 0
      while (d < dsub) {
        val r = books(off + d).toDouble +
          (if (base == null) 0.0 else base.getFloat(j * dsub + d).toDouble)
        rn += r * r
        d += 1
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](code, math.sqrt(rn)))
  }

  /** Per-QUERY ADC lookup table: lut[j * 256 + c] = dot(q_j, book[j][c]). */
  def lut(vec: ArrayData, books: Array[Float], m: Int, dsub: Int): ArrayData = {
    val out = new Array[Double](m * 256)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < 256) {
        val base = (j * 256 + c) * dsub
        var acc = 0.0
        var d = 0
        while (d < dsub) { acc += vec.getFloat(j * dsub + d).toDouble * books(base + d); d += 1 }
        out(j * 256 + c) = acc
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score of one candidate: m lookups — dot(q, recon(code)). */
  def adc(lut: ArrayData, code: Array[Byte]): Double = {
    var s = 0.0
    var j = 0
    while (j < code.length) { s += lut.getDouble(j * 256 + (code(j) & 0xff)); j += 1 }
    s
  }
}

/** Mixin caching the flattened codebook from a FOLDABLE child — the
  * codebook rides into the plan as one literal array<float>, converted to a
  * primitive float[] once per expression instance, not per row. */
trait PqBooksArg { self: Expression =>
  def books: Expression
  @transient protected lazy val booksArr: Array[Float] = {
    require(books.foldable, "PQ codebook argument must be a literal")
    books.eval(null).asInstanceOf[ArrayData].toFloatArray()
  }
}

/** `pq_encode(vec, books, m, dsub[, base])` → struct<code: binary,
  * rnorm: double>. With the optional 5th argument `vec` is a RESIDUAL and
  * `base` the coarse centroid it was taken against (rnorm = ||base +
  * recon||). Build-time (one pass over the corpus at train); interpreted. */
case class PqEncode(children: Seq[Expression]) extends GeoExpression with PqBooksArg {
  require(children.length == 4 || children.length == 5,
    s"pq_encode takes (vec, books, m, dsub[, base]), got ${children.length} args")
  override def books: Expression = children(1)
  override def dataType: DataType = StructType(Seq(
    StructField("code", BinaryType, nullable = false),
    StructField("rnorm", DoubleType, nullable = false)))
  override protected def evalNotNull(v: Array[Any]): Any =
    PqKernels.encode(v(0).asInstanceOf[ArrayData], booksArr,
      v(2).asInstanceOf[Int], v(3).asInstanceOf[Int],
      if (v.length > 4) v(4).asInstanceOf[ArrayData] else null)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c)
}

/** `pq_lut(qvec, books, m, dsub)` → array<double> of m*256 — once per
  * query row; interpreted (query side is the small side by construction). */
case class PqLut(vec: Expression, books: Expression, m: Expression, dsub: Expression)
    extends GeoExpression with PqBooksArg {
  override def children: Seq[Expression] = Seq(vec, books, m, dsub)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def evalNotNull(v: Array[Any]): Any =
    PqKernels.lut(v(0).asInstanceOf[ArrayData], booksArr,
      v(2).asInstanceOf[Int], v(3).asInstanceOf[Int])
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2), c(3))
}

/** `pq_code_at(code, j)` → unsigned byte j of a PQ code (diagnostics and
  * the codebook-training assignment readback). Codegen. */
case class PqCodeAt(code: Expression, j: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def left: Expression  = code
  override def right: Expression = j
  override def inputTypes        = Seq(BinaryType, IntegerType)
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(c: Any, jj: Any): Any =
    c.asInstanceOf[Array[Byte]](jj.asInstanceOf[Int]) & 0xff
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode) =
    defineCodeGen(ctx, ev, (c, jj) => s"(($c)[$jj] & 0xff)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** `pq_adc(lut, code)` → double. THE hot path — every (query, candidate)
  * pair scores through this; real codegen so the probe-join projection
  * stays inside whole-stage codegen. */
case class PqAdc(lut: Expression, code: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def left: Expression  = lut
  override def right: Expression = code
  override def inputTypes        = Seq(ArrayType(DoubleType), BinaryType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(l: Any, c: Any): Any =
    PqKernels.adc(l.asInstanceOf[ArrayData], c.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode) =
    defineCodeGen(ctx, ev, (l, c) => s"graft.ops.PqKernels.adc($l, $c)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
