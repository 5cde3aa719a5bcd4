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
