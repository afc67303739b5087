package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{call_function, udaf}
import org.apache.spark.sql.types._

/** Static kernels for the sketch expressions' generated code (the
  * MmRuntime/GeoRuntime pattern). */
object SketchRuntime {

  /** HyperLogLog estimate from a register blob (m = regs.length, a power
    * of two): the Flajolet–Fusy–Gandouet–Meunier estimator with the
    * small-range linear-counting correction. The 64-bit hash space makes
    * the classic large-range correction unnecessary at any realistic
    * cardinality. Standard error ≈ 1.04/√m (p=12 ⇒ ~1.6%). */
  def hllEstimate(regs: Array[Byte]): Double = {
    val m = regs.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var inv   = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      inv += java.lang.Double.longBitsToDouble((1023L - (regs(i) & 0xff)) << 52) // 2^-reg
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * m * m / inv
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }

  /** Register blob → ARRAY<INT> for inspection / oracle explosion. */
  def hllRegisters(regs: Array[Byte]): ArrayData =
    new GenericArrayData(regs.map(b => (b & 0xff): Any))

  /** The i-th Bloom bit position of a 64-bit hash: classic double hashing
    * pos_i = (h + i·mix64(h)) mod m with m a power of two — wrapping
    * arithmetic only, so the positions replay exactly in SQL. */
  def bloomPos(hash: Long, i: Int, mBits: Int): Int =
    ((hash + i.toLong * TextKernels.mix64(hash)) & (mBits - 1)).toInt

  /** CountMin point estimate: min over the d rows' probed counters. */
  def cmsEstimate(counters: ArrayData, hash: Long, d: Int): Long = {
    val w = counters.numElements() / d
    var best = Long.MaxValue
    var i = 0
    while (i < d) {
      val v = counters.getLong(i * w + bloomPos(hash, i, w))
      if (v < best) best = v
      i += 1
    }
    best
  }

  /** Membership test against a Bloom bitset blob (k double-hash probes).
    * False negatives: never. False positives: the standard Bloom rate —
    * and DETERMINISTIC, so an oracle replays them bit-for-bit. */
  def bloomContains(bits: Array[Byte], hash: Long, k: Int): Boolean = {
    val m = bits.length * 8
    var i = 0
    while (i < k) {
      val p = bloomPos(hash, i, m)
      if ((bits(p >> 3) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }
}

/** Mergeable cardinality sketches for corpus statistics at 10^12-row
  * scale, where exact `count(DISTINCT …)` forces a full shuffle of every
  * distinct value: a HyperLogLog register blob is 2^p bytes per group,
  * partial-aggregates map-side (the only exchange carries sketches, never
  * values), persists as a plain BINARY column, and merges EXACTLY
  * (element-wise max is associative + idempotent — shard-partials then
  * [[hll_merge]] is byte-identical to the one-shot sketch, the
  * [[CorpusStats.appendNgramShard]] accumulation pattern extended to
  * distinct counts).
  *
  * The caller supplies the 64-bit hash column (e.g. `mix64(xxhash64(x))`
  * or [[TextFunctions.mix64_col]]), keeping the sketch engine-reproducible:
  * bucket = top p bits, rho = leading zeros of the remaining bits + 1
  * (capped at 64-p+1 when they are all zero).
  */
object Sketches {

  /** bucket/rho update of a register blob, shared by both aggregators. */
  private def update(regs: Array[Byte], hash: Long, p: Int): Unit = {
    val bucket = (hash >>> (64 - p)).toInt
    val w      = hash << p
    val rho    = if (w == 0L) 64 - p + 1 else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rho > (regs(bucket) & 0xff)) regs(bucket) = rho.toByte
  }

  /** Sketch 64-bit hashes into 2^p registers (BINARY output). */
  final class HllAggregator(p: Int) extends Aggregator[Long, Array[Byte], Array[Byte]] {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    override def zero: Array[Byte] = new Array[Byte](1 << p)
    override def reduce(b: Array[Byte], hash: Long): Array[Byte] = { update(b, hash, p); b }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) {
        if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
        i += 1
      }
      a
    }
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Merge persisted sketches (shard partials → the corpus sketch). */
  final class HllMergeAggregator(p: Int) extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private val agg = new HllAggregator(p)
    override def zero: Array[Byte] = agg.zero
    override def reduce(b: Array[Byte], sk: Array[Byte]): Array[Byte] = {
      if (sk == null) return b // ignore-nulls semantics (a shard with a null partial)
      require(sk.length == b.length, s"sketch p mismatch: ${sk.length} vs ${b.length} registers")
      agg.merge(b, sk)
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = agg.merge(a, b)
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build a Bloom bitset over 64-bit hashes: mBits a power of two,
    * k double-hash probes per value. Merge = bitwise OR — associative +
    * idempotent, so shard partials OR together byte-identically to the
    * one-shot filter. The persisted blob is mBits/8 bytes; at 10^12 rows a
    * benchmark-membership filter becomes one broadcast blob + a codegen
    * probe per row instead of an exact-set join. */
  final class BloomAggregator(mBits: Int, k: Int)
      extends Aggregator[Long, Array[Byte], Array[Byte]] {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0, s"mBits must be a power of two >= 64, got $mBits")
    require(k >= 1 && k <= 16, s"k must be in [1, 16], got $k")
    override def zero: Array[Byte] = new Array[Byte](mBits / 8)
    override def reduce(b: Array[Byte], hash: Long): Array[Byte] = {
      var i = 0
      while (i < k) {
        val p = SketchRuntime.bloomPos(hash, i, mBits)
        b(p >> 3) = (b(p >> 3) | (1 << (p & 7))).toByte
        i += 1
      }
      b
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Output/buffer wrapper for the CountMin counters (product encoder). */
  final case class CmsBuf(v: Array[Long])

  /** Count-Min frequency sketch over 64-bit key hashes: d rows × w
    * counters (w a power of two), row i's bucket from the same double
    * hashing as [[BloomAggregator]] (pos_i = (h + i·mix64(h)) mod w —
    * wrapping arithmetic, SQL-replayable). Merge = element-wise SUM
    * (associative: shard partials sum to the one-shot sketch exactly);
    * point estimate = min over rows — an OVERESTIMATE, never under, with
    * error ≤ 2N/w at confidence 1 − 2^−d. The d·w·8-byte blob
    * partial-aggregates map-side, so frequency tables over 10^12 rows ship
    * kilobytes per group instead of shuffling keys. */
  final class CmsAggregator(w: Int, d: Int)
      extends Aggregator[Long, CmsBuf, CmsBuf] {
    require(w >= 64 && (w & (w - 1)) == 0, s"w must be a power of two >= 64, got $w")
    require(d >= 1 && d <= 8, s"d must be in [1, 8], got $d")
    override def zero: CmsBuf = CmsBuf(new Array[Long](d * w))
    override def reduce(b: CmsBuf, hash: Long): CmsBuf = {
      var i = 0
      while (i < d) { b.v(i * w + SketchRuntime.bloomPos(hash, i, w)) += 1; i += 1 }
      b
    }
    override def merge(a: CmsBuf, b: CmsBuf): CmsBuf = {
      var i = 0
      while (i < a.v.length) { a.v(i) += b.v(i); i += 1 }
      a
    }
    override def finish(r: CmsBuf): CmsBuf = r
    override def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
    override def outputEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
  }

  /** `cms_estimate(counters, hash, d)` → min-over-rows point frequency
    * estimate (LONG; w = counters.length / d). */
  case class CmsEstimate(counters: Expression, hash: Expression, d: Expression)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
      with ImplicitCastInputTypes {
    override def first: Expression  = counters
    override def second: Expression = hash
    override def third: Expression  = d
    override def inputTypes         = Seq(ArrayType(LongType), LongType, IntegerType)
    override def dataType: DataType = LongType
    override protected def nullSafeEval(c: Any, h: Any, dd: Any): Any =
      SketchRuntime.cmsEstimate(c.asInstanceOf[ArrayData],
        h.asInstanceOf[Long], dd.asInstanceOf[Int])
    override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode) =
      defineCodeGen(ctx, ev,
        (c, h, dd) => s"graft.ops.SketchRuntime.cmsEstimate($c, $h, $dd)")
    override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
      copy(a, b, c)
  }

  /** `bloom_contains(bits, hash, k)` → membership (BOOLEAN; no false
    * negatives, deterministic false positives). */
  case class BloomContains(bits: Expression, hash: Expression, k: Expression)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
      with ImplicitCastInputTypes {
    override def first: Expression  = bits
    override def second: Expression = hash
    override def third: Expression  = k
    override def inputTypes         = Seq(BinaryType, LongType, IntegerType)
    override def dataType: DataType = BooleanType
    override protected def nullSafeEval(b: Any, h: Any, kk: Any): Any =
      SketchRuntime.bloomContains(b.asInstanceOf[Array[Byte]],
        h.asInstanceOf[Long], kk.asInstanceOf[Int])
    override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode) =
      defineCodeGen(ctx, ev,
        (b, h, kk) => s"graft.ops.SketchRuntime.bloomContains($b, $h, $kk)")
    override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
      copy(a, b, c)
  }

  /** `hll_estimate(sketch)` → approximate distinct count (DOUBLE). */
  case class HllEstimate(sketch: Expression) extends UnaryExpression with ImplicitCastInputTypes {
    override def child: Expression = sketch
    override def inputTypes        = Seq(BinaryType)
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(v: Any): Any =
      SketchRuntime.hllEstimate(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode) =
      defineCodeGen(ctx, ev, c => s"graft.ops.SketchRuntime.hllEstimate($c)")
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** `hll_registers(sketch)` → ARRAY<INT> register values. */
  case class HllRegisters(sketch: Expression) extends UnaryExpression with ImplicitCastInputTypes {
    override def child: Expression = sketch
    override def inputTypes        = Seq(BinaryType)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      SketchRuntime.hllRegisters(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode) =
      defineCodeGen(ctx, ev, c => s"graft.ops.SketchRuntime.hllRegisters($c)")
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "hll_estimate"   -> (es => HllEstimate(es.head)),
    "hll_registers"  -> (es => HllRegisters(es.head)),
    "bloom_contains" -> (es => BloomContains(es(0), es(1), es(2))),
    "cms_estimate"   -> (es => CmsEstimate(es(0), es(1), es(2))))

  @volatile private var registered: Set[Int] = Set.empty

  /** Idempotent per-session registration. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val key = System.identityHashCode(spark)
    if (!registered.contains(key)) synchronized {
      builders.foreach { case (name, b) =>
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "built-in")
      }
      registered += key
    }
  }

  // --------------------------------------------------------- Column API

  def hll_sketch(hash: Column, p: Int = 12): Column =
    udaf(new HllAggregator(p)).apply(hash)
  def hll_merge(sketch: Column, p: Int = 12): Column =
    udaf(new HllMergeAggregator(p)).apply(sketch)
  def hll_estimate(sketch: Column): Column  = call_function("hll_estimate", sketch)
  def hll_registers(sketch: Column): Column = call_function("hll_registers", sketch)
  def bloom_sketch(hash: Column, mBits: Int = 1 << 20, k: Int = 4): Column =
    udaf(new BloomAggregator(mBits, k)).apply(hash)
  def bloom_contains(bits: Column, hash: Column, k: Column): Column =
    call_function("bloom_contains", bits, hash, k)
  def cms_sketch(hash: Column, w: Int = 1 << 12, d: Int = 4): Column =
    udaf(new CmsAggregator(w, d)).apply(hash)
  def cms_estimate(counters: Column, hash: Column, d: Column): Column =
    call_function("cms_estimate", counters, hash, d)
}
