package graft.functions

/** Minimal open-addressing long→double map (linear probing, power-of-2
  * capacity). Built once per model at class-init; read-only afterwards.
  * Exists so the per-document scorer can look up n-gram weights by a
  * 64-bit hash computed directly from chars — zero substring allocation
  * in the hot loop (the String-keyed HashMap version allocated ~150 KB
  * of transient substrings per document).
  */
final class LongDoubleMap(expected: Int) {
  private val cap = {
    var c = 8
    while (c < expected * 2) c <<= 1
    c
  }
  private val mask = cap - 1
  private val keys = new Array[Long](cap)
  private val vals = new Array[Double](cap)
  private val used = new Array[Boolean](cap)

  def put(k: Long, v: Double): Unit = {
    var i = (java.lang.Long.hashCode(k) & mask)
    while (used(i) && keys(i) != k) i = (i + 1) & mask
    keys(i) = k; vals(i) = v; used(i) = true
  }

  /** Returns `dflt` when absent. */
  def getOrDefault(k: Long, dflt: Double): Double = {
    var i = (java.lang.Long.hashCode(k) & mask)
    while (used(i)) {
      if (keys(i) == k) return vals(i)
      i = (i + 1) & mask
    }
    dflt
  }
}

/** Open-addressing long→double[stride] map: one probe returns a whole
  * payload row. Exists so the per-trigram scoring loop pays ONE random
  * memory access per gram instead of one per language table plus one for
  * the LM (the 5-language + LM split measured ~6 probes × ~1,300 grams
  * per document — the dominant kernel cost).
  */
final class LongPayloadMap(expected: Int, val stride: Int) {
  private val cap = {
    var c = 8
    while (c < expected * 2) c <<= 1
    c
  }
  private val mask = cap - 1
  private val keys = new Array[Long](cap)
  private val used = new Array[Boolean](cap)
  /** payload rows, laid out slot-major: values[slot*stride + j]. */
  val values = new Array[Double](cap * stride)

  /** Returns the payload base offset for `k`, creating the slot. */
  def slotFor(k: Long): Int = {
    var i = (java.lang.Long.hashCode(k) & mask)
    while (used(i) && keys(i) != k) i = (i + 1) & mask
    keys(i) = k; used(i) = true
    i * stride
  }

  /** Payload base offset, or -1 when absent. */
  def find(k: Long): Int = {
    var i = (java.lang.Long.hashCode(k) & mask)
    while (used(i)) {
      if (keys(i) == k) return i * stride
      i = (i + 1) & mask
    }
    -1
  }
}

/** Cache-line-shaped variant of [[LongPayloadMap]]: ONE flat long array
  * whose rows hold [key | nFloats packed float32 cells (two per long,
  * low half first) | one full double], padded to a power-of-2 stride.
  * At the fused scorer's shape (9 lang scores + 1 LM log-prob) a row is
  * 1 + 5 + 1 → 8 longs = exactly 64 B, so a probe that previously
  * touched FOUR structures (`used[]`, `keys[]`, and a 2-line 80 B value
  * row) now usually touches ONE cache line: the key test and the whole
  * payload share the row. Floats widen to double EXACTLY, so as long as
  * the stored values are float-representable (the model quantizes at
  * build, [[LangIdModel.model]]) the unpacked sums are bit-identical to
  * the all-double path.
  *
  * Key 0 is the empty sentinel; a real key of 0 (probability 2⁻⁶⁴ per
  * gram) is stored in a dedicated overflow row past the table.
  */
final class LongPackedMap(expected: Int, nFloats: Int) {
  private val cap = {
    var c = 8
    while (c < expected * 2) c <<= 1
    c
  }
  private val mask = cap - 1
  /** longs per row (key included), padded to a power of 2. */
  val stride: Int = {
    val raw = 1 + (nFloats + 1) / 2 + 1
    var p = 1
    while (p < raw) p <<= 1
    p
  }
  /** offset (in longs, relative to the PAYLOAD base) of the trailing double. */
  val tailSlot: Int = (nFloats + 1) / 2
  private var hasZero = false
  private val zeroPayload = cap * stride + 1
  /** rows, slot-major: values[slot*stride] = key, payload follows. */
  val values = new Array[Long]((cap + 1) * stride)

  /** Returns the PAYLOAD base offset (in longs) for `k`, creating the slot. */
  def slotFor(k: Long): Int = {
    if (k == 0L) { hasZero = true; return zeroPayload }
    var i = (java.lang.Long.hashCode(k) & mask)
    while (values(i * stride) != 0L && values(i * stride) != k) i = (i + 1) & mask
    values(i * stride) = k
    i * stride + 1
  }

  /** PAYLOAD base offset (in longs), or -1 when absent. */
  def find(k: Long): Int = {
    if (k == 0L) return if (hasZero) zeroPayload else -1
    var i = (java.lang.Long.hashCode(k) & mask)
    var key = values(i * stride)
    while (key != 0L) {
      if (key == k) return i * stride + 1
      i = (i + 1) & mask
      key = values(i * stride)
    }
    -1
  }

  def putFloat(base: Int, idx: Int, v: Float): Unit = {
    val slot = base + (idx >> 1)
    val bits = java.lang.Float.floatToRawIntBits(v).toLong & 0xffffffffL
    values(slot) =
      if ((idx & 1) == 0) (values(slot) & 0xffffffff00000000L) | bits
      else (values(slot) & 0x00000000ffffffffL) | (bits << 32)
  }

  def putDouble(base: Int, v: Double): Unit =
    values(base + tailSlot) = java.lang.Double.doubleToRawLongBits(v)
}
