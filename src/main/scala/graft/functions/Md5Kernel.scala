package graft.functions

/** Shared byte-level helpers for the md5-based kernels
  * ([[FingerprintMd5Expr]], [[MinHashSigExpr]]). Each kernel claims
  * bit-parity with a declarative HOF spec and a DuckDB oracle, so the
  * comparison and encoding MUST stay identical across them — one
  * implementation, not per-kernel copies.
  */
private[functions] object Md5Kernel {

  /** Unsigned lexicographic byte comparison — orders exactly like comparing
    * the lowercase-hex encodings (what `array_min` over md5 strings does).
    */
  def lessUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Lowercase hex, appended to `sb` (the form Spark/DuckDB `md5` emit). */
  def appendHex(sb: StringBuilder, bytes: Array[Byte]): Unit = {
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sb.append(hexDigits(b >> 4)).append(hexDigits(b & 0xf))
      i += 1
    }
  }
}
