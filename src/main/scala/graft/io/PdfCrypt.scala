package graft.io

import java.security.MessageDigest

/** PDF standard security handler (ISO 32000-1 §7.6.3) — the
  * empty-user-password subset a crawl pipeline actually meets: a
  * meaningful share of crawled PDFs are "encrypted" only to restrict
  * printing/copying, with the EMPTY user password that every viewer
  * supplies silently. This module implements the deterministic key
  * derivation (Algorithm 2), the owner/user entries (Algorithms 3-5),
  * and the per-object string/stream ciphers for revisions 2-4:
  * RC4-40 (V1/R2), RC4-128 (V2/R3), and AES-128-CBC (V4/R4 with
  * /CFM /AESV2) — all from the public spec; RC4 is the textbook
  * stream cipher (the spec's §7.6.2 cipher), AES comes from the JDK.
  *
  * Out of scope (reject, never guess): non-/Standard filters, V5/R5-6
  * (AES-256, SHA-2 derivation), non-empty user passwords, crypt
  * filters other than the /StdCF-everywhere shape. Failure surfaces
  * as the extractor's all-or-nothing None.
  *
  * Scale shape: pure row-local byte work inside the same Dataset map
  * as the rest of the front door — the key derivation runs once per
  * document, the per-object MD5+cipher at stream grain.
  */
private[graft] object PdfCrypt {

  /** The 32-byte padding string of §7.6.3.3 — the empty password IS
    * this pad after Algorithm 2's step (a).
    */
  val Pad: Array[Byte] = Array(
    0x28, 0xbf, 0x4e, 0x5e, 0x4e, 0x75, 0x8a, 0x41,
    0x64, 0x00, 0x4e, 0x56, 0xff, 0xfa, 0x01, 0x08,
    0x2e, 0x2e, 0x00, 0xb6, 0xd0, 0x68, 0x3e, 0x80,
    0x2f, 0x0c, 0xa9, 0xfe, 0x64, 0x53, 0x69, 0x7a).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    parts.foreach(md.update)
    md.digest()
  }

  /** RC4 (§7.6.2): symmetric — the same call encrypts and decrypts. */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + (s(i) & 0xff) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    i = 0; j = 0
    var x = 0
    while (x < data.length) {
      i = (i + 1) & 0xff
      j = (j + (s(i) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      out(x) = (data(x) ^ s(((s(i) & 0xff) + (s(j) & 0xff)) & 0xff)).toByte
      x += 1
    }
    out
  }

  private def le4(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Algorithm 2: the file encryption key for the EMPTY user password.
    * `n` is the key length in bytes (5 for R2, /Length/8 otherwise).
    */
  def fileKey(o: Array[Byte], p: Int, id0: Array[Byte], n: Int, r: Int,
              encryptMetadata: Boolean): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    md.update(Pad) // padded empty user password
    md.update(o, 0, 32)
    md.update(le4(p))
    md.update(id0)
    if (r >= 4 && !encryptMetadata)
      md.update(Array(0xff, 0xff, 0xff, 0xff).map(_.toByte))
    var h = md.digest()
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(h.take(n)); i += 1 }
    }
    h.take(n)
  }

  /** Algorithm 3: the /O entry for empty owner AND user passwords. */
  def ownerEntry(n: Int, r: Int): Array[Byte] = {
    var h = md5(Pad) // padded (empty) owner password
    if (r >= 3) { var i = 0; while (i < 50) { h = md5(h); i += 1 } }
    val rc4Key = h.take(n)
    var o = rc4(rc4Key, Pad) // padded (empty) user password
    if (r >= 3) {
      var i = 1
      while (i <= 19) {
        o = rc4(rc4Key.map(b => (b ^ i).toByte), o)
        i += 1
      }
    }
    o
  }

  /** Algorithms 4/5: the /U entry for the file key (what a conforming
    * writer stores, and what [[userCheck]] recomputes to verify).
    */
  def userEntry(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      var x = rc4(key, md5(Pad, id0))
      var i = 1
      while (i <= 19) {
        x = rc4(key.map(b => (b ^ i).toByte), x)
        i += 1
      }
      x ++ new Array[Byte](16) // 16 bytes of arbitrary padding (§7.6.3.4)
    }

  /** True iff `u` proves the empty user password under `key` (R≥3
    * compares the first 16 bytes only, §7.6.3.4 Algorithm 6).
    */
  def userCheck(key: Array[Byte], id0: Array[Byte], r: Int,
                u: Array[Byte]): Boolean = {
    if (u.length < 32) return false
    val expect = userEntry(key, id0, r)
    val take = if (r == 2) 32 else 16
    java.util.Arrays.equals(expect.take(take), u.take(take))
  }

  /** Per-object cipher (§7.6.2 Algorithm 1): object key =
    * MD5(file key ‖ objnum₃LE ‖ gen₂LE ‖ "sAlT" when AES), truncated to
    * min(n+5, 16); RC4 directly, or AES-128-CBC with the 16-byte IV
    * prefixed to the ciphertext and PKCS#5 padding.
    */
  final class ObjectCipher(key: Array[Byte], val aes: Boolean) {
    private def objKey(num: Int, gen: Int): Array[Byte] = {
      val md = MessageDigest.getInstance("MD5")
      md.update(key)
      md.update(Array(
        (num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
        ((num >> 16) & 0xff).toByte,
        (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte))
      if (aes) md.update(Array(0x73, 0x41, 0x6c, 0x54).map(_.toByte))
      md.digest().take(math.min(key.length + 5, 16))
    }

    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      if (!aes) rc4(objKey(num, gen), data)
      else {
        if (data.length < 32 || data.length % 16 != 0)
          throw new IllegalArgumentException(
            s"AES ciphertext length ${data.length} is not IV + whole blocks")
        val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
        c.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(objKey(num, gen), "AES"),
          new javax.crypto.spec.IvParameterSpec(data, 0, 16))
        val plain = c.doFinal(data, 16, data.length - 16)
        val p = plain(plain.length - 1) & 0xff
        if (p < 1 || p > 16 || p > plain.length ||
            !plain.takeRight(p).forall(b => (b & 0xff) == p))
          throw new IllegalArgumentException("bad AES padding")
        plain.dropRight(p)
      }

    /** Builder-side encryption; the AES IV derives deterministically
      * from the object key and plaintext (a FIXTURE writer needs
      * byte-stable output; uniqueness across objects still holds —
      * the object key differs per object).
      */
    def encrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      if (!aes) rc4(objKey(num, gen), data)
      else {
        val k = objKey(num, gen)
        val iv = md5(k, data).take(16)
        val padLen = 16 - (data.length % 16)
        val padded = data ++ Array.fill(padLen)(padLen.toByte)
        val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
        c.init(javax.crypto.Cipher.ENCRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(k, "AES"),
          new javax.crypto.spec.IvParameterSpec(iv))
        iv ++ c.doFinal(padded)
      }
  }
}
