package graft.functions

/** SplitMix64 mixing (public-domain constants) + the derived
  * parameter families shared by the deterministic hash-based
  * operators (MinHash permutations, LSH hyperplanes, IVF codebook).
  * One definition — signatures and buckets stay comparable across
  * every operator and session. */
object DeterministicHash {

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Smallest prime above 2^31 — the modulus that turns the affine
    * maps into genuine (near-)permutations of the 31-bit hash domain.
    * WITHOUT the mod, a*x+b is monotone in x, so all k "permutations"
    * share one argmin and the MinHash signature degenerates to k
    * affine images of the single minimum shingle (two docs then agree
    * on ALL bands or NONE — caught by ComponentsSpec's chain test).
    * Operands stay ANSI-safe: a, b, x < 2^31 → a*x+b < 2^62. */
  val MinhashP: Long = 2147483659L

  /** 31-bit odd multipliers for the k affine MinHash permutations
    * (31-bit so a*h+b stays < 2^62 under ANSI mode). */
  def minhashA(k: Int): Array[Long] =
    Array.tabulate(k)(i => (splitmix64(i.toLong) & 0x7FFFFFFFL) | 1L)

  /** 31-bit offsets for the k affine MinHash permutations. */
  def minhashB(k: Int): Array[Long] =
    Array.tabulate(k)(i => splitmix64(i.toLong + 0x5eed) & 0x7FFFFFFFL)
}
