package graft.ingest

/** SplitMix64 PRNG (public domain algorithm, Steele et al., "Fast Splittable
  * Pseudorandom Number Generators", OOPSLA 2014). Used to synthesize the
  * deterministic web-page fixture: every stream is keyed by (seed, pageId),
  * so generation is order-independent and wall-clock-free (FIXTURES.md §1-2).
  */
final class SplitMix64(seed0: Long) {
  private var state: Long = seed0

  def nextLong(): Long = {
    state += 0x9e3779b97f4a7c15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform in [0, bound). */
  def nextInt(bound: Int): Int = (Math.floorMod(nextLong(), bound.toLong)).toInt

  /** Uniform double in [0, 1). */
  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
}

object SplitMix64 {
  /** Stateless mix of two longs into one stream seed. */
  def mix(a: Long, b: Long): Long = {
    var z = a * 0x9e3779b97f4a7c15L + b
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
