package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact pigeonhole band plan for Hamming-bounded fingerprint pairing,
  * parameterized in (fingerprint bits, block count, max Hamming distance).
  *
  * Generalizes the fixed one-block-per-key pigeonhole the SimHash tiers
  * shipped with (4×16-bit bands for 64/≤3, 7×4-5-bit bands for 32/≤6) to
  * the block-combination scheme of Manku, Jain & Das Sarma, "Detecting
  * Near-Duplicates for Web Crawling" (WWW 2007, §3): split the
  * fingerprint into `blocks` near-equal blocks; two fingerprints within
  * Hamming distance ≤ `maxHamming` differ in at most `maxHamming` blocks,
  * so they AGREE on every block of at least one of the
  * C(blocks, blocks−maxHamming) combinations of (blocks−maxHamming)
  * blocks — keying candidates on each combination's concatenated bits
  * keeps recall exactly 1.0 at ANY block count.
  *
  * Why the knob matters at scale: a candidate bucket holds the docs
  * agreeing on one key, and the within-bucket verify cost grows as
  * Σ c² ≈ n²/2^keyBits. With the degenerate `blocks = maxHamming+1`
  * (one block per key) a 64-bit/≤3 plan has 16-bit keys — saturated by
  * ~10⁶ docs per language, the exact n²/2^w arithmetic that condemned
  * the 32-bit tier at sf1 and showed up as the 64-bit tier's 3.1×
  * growth at sf5 (SCALE.md). Raising `blocks` widens the key to
  * ⌊bits·(blocks−maxHamming)/blocks⌋ bits (blocks=6 → 32-bit keys,
  * 2¹⁶× later saturation) at the linear cost of C(blocks, maxHamming)
  * keys per doc (6→20) — a per-row constant traded against a quadratic
  * term, the right trade everywhere past the small-corpus regime.
  *
  * Reference capability context: the dedup analog of the reference's
  * package-identity matching (`/root/reference/odgovlt.py:312`) at
  * SURVEY.md §2.11 scale.
  */
final case class BandPlan(bits: Int, blocks: Int, maxHamming: Int) {
  require(bits > 0 && bits <= 64, s"bits=$bits must be in [1,64]")
  require(maxHamming >= 0, s"maxHamming=$maxHamming must be >= 0")
  require(blocks > maxHamming && blocks <= bits,
    s"blocks=$blocks must exceed maxHamming=$maxHamming (pigeonhole) " +
      s"and not exceed bits=$bits")

  /** (offset, width) per block over the fingerprint's low `bits` bits,
    * LSB-first, near-equal widths with the first `bits % blocks` blocks
    * one bit wider — reproduces the legacy fixed layouts exactly
    * (32/7 → widths 5,5,5,5,4,4,4 at offsets 0,5,10,15,20,24,28;
    * 64/4 → widths 16,16,16,16).
    */
  val layout: Vector[(Int, Int)] = {
    val base = bits / blocks
    val extra = bits % blocks
    val widths = Vector.tabulate(blocks)(i => if (i < extra) base + 1 else base)
    widths.scanLeft(0)(_ + _).zip(widths).toVector
  }

  /** Combinations of block indices, each of size `blocks − maxHamming`,
    * in lexicographic order — the candidate key families. For the
    * degenerate `blocks = maxHamming+1` these are the singletons
    * (0),(1),…, i.e. the legacy one-block-per-band scheme.
    */
  val combos: Vector[Vector[Int]] =
    (0 until blocks).toVector.combinations(blocks - maxHamming).toVector

  /** Keys emitted per document — the linear explode factor. */
  def keysPerDoc: Int = combos.length

  /** Width of the narrowest combination key — the saturation bound:
    * expected bucket occupancy is n_lang / 2^keyBits.
    */
  def keyBits: Int = combos.map(_.map(i => layout(i)._2).sum).min

  /** Combination key `comboIdx` of fingerprint `sh` as a Column
    * expression: the selected blocks' bits concatenated LSB-block-first
    * into one long. `sh` must already be LongType (callers cast; a
    * sign-extended 32-bit fingerprint is fine — every selected block
    * lives below bit `bits` and the per-block mask clears the extension).
    */
  def keyCol(sh: Column, comboIdx: Int): Column =
    combos(comboIdx).foldLeft(lit(0L): Column) { (acc, bi) =>
      val (off, w) = layout(bi)
      shiftleft(acc, w).bitwiseOR(
        shiftrightunsigned(sh, off).bitwiseAND(lit((1L << w) - 1L)))
    }

  /** Scala twin of [[keyCol]] — one arithmetic, two substrates; the spec
    * pins the Column form against this on random fingerprints.
    */
  def keyOf(sh: Long, comboIdx: Int): Long =
    combos(comboIdx).foldLeft(0L) { (acc, bi) =>
      val (off, w) = layout(bi)
      (acc << w) | ((sh >>> off) & ((1L << w) - 1L))
    }
}

object BandPlan {

  /** Smallest block count whose keys stay unsaturated at a given corpus
    * size, under a per-doc key budget: the first `blocks` whose
    * `keyBits ≥ log2(nDocs) + marginBits` (expected bucket occupancy
    * ≤ 2^−margin), or the widest plan still within `maxKeysPerDoc` when
    * no affordable plan reaches the target (the fingerprint's fixed
    * width caps keyBits at `bits − (width of maxHamming blocks)` — past
    * that corpus size the answer is a wider fingerprint, not more
    * blocks).
    */
  def blocksForCorpus(bits: Int, maxHamming: Int, nDocs: Long,
                      marginBits: Int = 4, maxKeysPerDoc: Int = 64): Int = {
    require(nDocs >= 1, s"nDocs=$nDocs must be >= 1")
    val needBits = math.ceil(
      math.log(math.max(nDocs, 2).toDouble) / math.log(2.0)).toInt + marginBits
    def widthsOf(b: Int): Vector[Int] = {
      val base = bits / b
      val extra = bits % b
      Vector.tabulate(b)(i => if (i < extra) base + 1 else base)
    }
    def keyBitsOf(b: Int): Int =
      // narrowest combo = the (b − maxHamming) narrowest blocks
      widthsOf(b).sorted.take(b - maxHamming).sum
    def keysOf(b: Int): Long =
      // C(b, maxHamming), computed multiplicatively; capped to avoid overflow
      (1 to maxHamming).foldLeft(1L) { (acc, i) =>
        math.min(acc * (b - i + 1) / i, 1L << 30)
      }
    var best = maxHamming + 1
    var b = maxHamming + 1
    while (b <= bits && keysOf(b) <= maxKeysPerDoc) {
      best = b
      if (keyBitsOf(b) >= needBits) return b
      b += 1
    }
    best
  }
}
