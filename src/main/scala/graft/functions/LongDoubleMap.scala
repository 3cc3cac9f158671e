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
