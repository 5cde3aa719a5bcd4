package graft.functions

import java.security.MessageDigest

import org.apache.spark.unsafe.types.UTF8String

/** THE engine-side md5 hash contract, shared by every native digest-loop
  * expression (HashedScore, MinhashSig, SimhashSketch, RollingFingerprint):
  * the first 8 md5 hex digits as an unsigned 32-bit value — bit-for-bit
  * graft.llm.TextHash.md5Long (= the oracles' hexIntSql). ONE definition
  * site: a change to the hash contract has exactly one place to land, and
  * the per-expression specs pinning native == declarative fold keep it
  * honest.
  */
object Md5Ops {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** One ThreadLocal lookup per ROW: callers acquire the digest once and
    * pass it through their token loop.
    */
  def acquire(): MessageDigest = digest.get()

  /** First 4 digest bytes as an unsigned 32-bit value. */
  private def extract(md: MessageDigest): Long = {
    val d = md.digest()
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def md5Long32(md: MessageDigest, s: UTF8String): Long = {
    md.reset()
    md.update(s.getBytes)
    extract(md)
  }

  /** First 8 digest bytes as a SIGNED 64-bit value (big-endian — the
    * integer the first 16 md5 hex digits spell, bit 63 = the hex
    * string's leading bit). The 64-bit widening of the 32-bit contract
    * above: the low half equals hex digits 9–16, the high half equals
    * [[md5Long32]]'s digits 1–8, which is exactly how the SQL oracles
    * replay it (two 32-bit halves; DuckDB BIGINT can't hold the
    * unsigned 64-bit form whole).
    */
  def md5Long64(md: MessageDigest, s: UTF8String): Long = {
    md.reset()
    md.update(s.getBytes)
    val d = md.digest()
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  /** Salted form: hash of `salt || s` (string concatenation = byte-stream
    * concatenation for UTF-8).
    */
  def md5Long32(md: MessageDigest, salt: UTF8String, s: UTF8String): Long = {
    md.reset()
    md.update(salt.getBytes)
    md.update(s.getBytes)
    extract(md)
  }
}
