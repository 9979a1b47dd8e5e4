package graft.functions

/**
 * Vector-LSH runtime kernels (sign-of-projection hashing over
 * array<float> embeddings). Hyperplanes are deterministic ±1 patterns
 * derived from splitmix64 parity — no stored model, identical on driver
 * and executors, so a query's bucket key is computed driver-side without
 * launching a job (the reference's client-side planning analog:
 * geomesa-core/.../index/QueryPlanner.scala computes scan ranges on the
 * client the same way).
 */
object VecRT {

  /** ±1 sign of hyperplane `i` at component `j` (splitmix64 parity). */
  @inline def planeSign(i: Int, j: Int): Double =
    if ((TextRT.mix64(j.toLong * 2654435761L + i.toLong * 40503L) & 1L) == 0L) 1.0 else -1.0

  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Double]]]()

  /** Cached bits×dim hyperplane matrix. */
  def planes(bits: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((bits.toLong << 32) | dim.toLong,
      _ => Array.tabulate(bits, dim)((i, j) => planeSign(i, j)))

  /** Signed projections of `vec` onto each hyperplane. */
  def projections(vec: Array[Float], bits: Int): Array[Double] = {
    val ps = planes(bits, vec.length)
    val out = new Array[Double](bits)
    var i = 0
    while (i < bits) {
      val p = ps(i)
      var acc = 0.0
      var j = 0
      while (j < vec.length) { acc += vec(j) * p(j); j += 1 }
      out(i) = acc
      i += 1
    }
    out
  }

  /** LSH bucket key: bit i set iff projection i is positive. */
  def lshKey(vec: Array[Float], bits: Int): Long = {
    val pr = projections(vec, bits)
    var key = 0L
    var i = 0
    while (i < bits) { if (pr(i) > 0) key |= (1L << i); i += 1 }
    key
  }

  /**
   * Multiprobe key set: the base key plus single-bit flips of the
   * `nprobe - 1` weakest (smallest |projection|) hyperplanes — the signs
   * most likely to differ for a true near neighbor (multi-probe LSH,
   * Lv et al. VLDB'07). probes(0) is always the base key.
   */
  def lshProbes(vec: Array[Float], bits: Int, nprobe: Int): Array[Long] = {
    val pr = projections(vec, bits)
    var key = 0L
    var i = 0
    while (i < bits) { if (pr(i) > 0) key |= (1L << i); i += 1 }
    val order = Array.range(0, bits).sortBy(i => math.abs(pr(i)))
    val n = math.min(nprobe, bits + 1)
    val out = new Array[Long](n)
    out(0) = key
    var p = 1
    while (p < n) { out(p) = key ^ (1L << order(p - 1)); p += 1 }
    out
  }
}
