package graft.pipeline

/** Per-thread TWO-entry decode cache keyed on payload CONTENT.
  *
  * Sibling expressions in one projection (image_meta + image_gray_mean +
  * image_psnr over the same binary column) evaluate against the same payload
  * row by row, but Spark's subexpression elimination can only share
  * IDENTICAL expression trees — different kernels over the same column each
  * re-decode. This cache makes the second and later decodes of a row hit:
  * content equality (not reference — each UnsafeRow.getBinary call copies),
  * two entries so a binary kernel (psnr(a, b)) doesn't evict its first
  * argument while decoding its second. For the synthetic GRB1/PCA1/VID1
  * formats a decode is a header parse + copy; for an external codec behind
  * the marked seam this cache is the difference between one and N full
  * decodes per row. Thread-local, so executor task threads never contend.
  *
  * `misses` counts ACTUAL decodes (cache misses) — test-visible, used by the
  * one-decode-per-row plan spec.
  */
private[graft] final class DecodeCache[T <: AnyRef](decode: Array[Byte] => T) {
  val misses = new java.util.concurrent.atomic.AtomicLong(0L)

  // slots: [key0, val0, key1, val1]; `next` picks the overwrite victim
  private final class State {
    var k0: Array[Byte] = _
    var v0: T           = _
    var k1: Array[Byte] = _
    var v1: T           = _
    var next            = 0
  }
  private val tl = new ThreadLocal[State] { override def initialValue() = new State }

  @inline private def hits(k: Array[Byte], bytes: Array[Byte]): Boolean =
    (k ne null) && ((k eq bytes) || java.util.Arrays.equals(k, bytes))

  def apply(bytes: Array[Byte]): T = {
    val s = tl.get()
    if (hits(s.k0, bytes)) return s.v0
    if (hits(s.k1, bytes)) return s.v1
    misses.incrementAndGet()
    val v = decode(bytes)
    if (s.next == 0) { s.k0 = bytes; s.v0 = v; s.next = 1 }
    else { s.k1 = bytes; s.v1 = v; s.next = 0 }
    v
  }
}
