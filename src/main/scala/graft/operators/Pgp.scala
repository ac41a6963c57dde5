package graft.operators

import java.security.MessageDigest

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EncryptContentPGP / DecryptContentPGP (NiFi's PGP processors),
  * passphrase mode — OpenPGP RFC 4880 hand-rolled on the JDK's JCE
  * (no BouncyCastle exists offline, and none is needed for the
  * symmetric half: AES + SHA are JCE primitives; everything else is
  * packet grammar). The spec proves REAL interop against the
  * installed GnuPG both directions — graft output decrypts with
  * `gpg`, `gpg --symmetric` output (compressed, partial-length
  * framing and all) decrypts here — the [[graft.streaming.Mqtt]] /
  * [[graft.streaming.Amqp]] discipline: public spec, JDK only, live
  * gates.
  *
  * Message shape produced (RFC 4880 §5.3, §5.13): SKESK v4 (S2K
  * iterated+salted, SHA-256, the session key IS the S2K output) +
  * SEIPD v1 holding CFB-encrypted (zero IV, §5.13) plaintext =
  * bs+2 prefix with repeated check bytes ‖ Literal packet ‖ MDC
  * (SHA-1, §5.14). Optional ASCII armor (§6) with CRC24. Messages
  * parsed accept old- and new-format headers, partial body lengths,
  * multiple SKESKs, and ZIP/ZLIB Compressed Data packets (§5.6) —
  * i.e. stock `gpg --symmetric` output with its defaults intact.
  *
  * DETERMINISM (documented trade): the S2K salt derives from the
  * passphrase alone (so the ~24 MB key derivation runs ONCE per
  * passphrase, cached per task — not per row) and the per-message
  * CFB prefix block derives from SHA-256 of (passphrase ‖ payload) —
  * "synthetic IV" construction; the prefix is exactly the
  * per-message randomizer RFC 4880 §5.13's zero-IV design intends.
  * Encryption is therefore a pure function: re-runs and speculative
  * retries produce identical bytes, at the documented cost that
  * equal payloads under the same passphrase yield equal ciphertexts
  * (payload-equality leakage only; the key is never weakened). gpg
  * decrypts such messages exactly as random-salt ones.
  *
  * Scale: pure per-row byte work — narrow, no shuffle, no driver
  * involvement; the passphrase travels in the plan like every other
  * literal property (NiFi stores it in the processor config the same
  * way).
  */
object Pgp {

  // ---- algorithm ids (RFC 4880 §9) ----
  private val HashSha1 = 2
  private val HashSha256 = 8
  private val CipherAes128 = 7
  private val CipherAes192 = 8
  private val CipherAes256 = 9

  private def keyBytes(algo: Int): Int = algo match {
    case CipherAes128 => 16
    case CipherAes192 => 24
    case CipherAes256 => 32
    case other => throw new IllegalArgumentException(s"PGP: unsupported cipher algo $other")
  }
  private def hashOf(algo: Int): MessageDigest = algo match {
    case HashSha1 => MessageDigest.getInstance("SHA-1")
    case HashSha256 => MessageDigest.getInstance("SHA-256")
    case other => throw new IllegalArgumentException(s"PGP: unsupported S2K hash $other")
  }

  /** Iterated+salted S2K (§3.7.1.3): hash `count` bytes of the
    * repeated (salt ‖ passphrase) stream — at least one full copy —
    * with the multi-context zero-preload trick when the key outgrows
    * the digest. */
  private[operators] def s2k(pass: Array[Byte], salt: Array[Byte], count: Long,
                             hashAlgo: Int, keyLen: Int): Array[Byte] = {
    val out = new Array[Byte](keyLen)
    var produced = 0
    var ctx = 0
    while (produced < keyLen) {
      val md = hashOf(hashAlgo)
      var i = 0
      while (i < ctx) { md.update(0.toByte); i += 1 }
      val stream = salt ++ pass
      var remaining = math.max(count, stream.length.toLong)
      while (remaining > 0) {
        val n = math.min(remaining, stream.length.toLong).toInt
        md.update(stream, 0, n)
        remaining -= n
      }
      val d = md.digest()
      val take = math.min(d.length, keyLen - produced)
      System.arraycopy(d, 0, out, produced, take)
      produced += take
      ctx += 1
    }
    out
  }

  @inline private def decodeCount(c: Int): Long =
    (16L + (c & 15)) << ((c >> 4) + 6)

  // ---- packet framing ----
  private def newHeader(tag: Int, len: Int): Array[Byte] = {
    val b = scala.collection.mutable.ArrayBuffer[Byte]((0xC0 | tag).toByte)
    if (len < 192) b += len.toByte
    else if (len < 8384) {
      b += (((len - 192) >> 8) + 192).toByte
      b += ((len - 192) & 0xFF).toByte
    } else {
      b += 0xFF.toByte
      b += (len >>> 24).toByte; b += (len >>> 16).toByte
      b += (len >>> 8).toByte; b += len.toByte
    }
    b.toArray
  }

  /** One parsed packet: (tag, body). Handles new-format definite and
    * PARTIAL lengths (gpg streams SEIPD bodies that way) and
    * old-format headers. */
  private final class PacketReader(data: Array[Byte]) {
    private var pos = 0
    def hasNext: Boolean = pos < data.length
    private def u8(): Int = { val v = data(pos) & 0xFF; pos += 1; v }
    def next(): (Int, Array[Byte]) = {
      val first = u8()
      require((first & 0x80) != 0, s"PGP: invalid packet header 0x${first.toHexString}")
      if ((first & 0x40) != 0) { // new format
        val tag = first & 0x3F
        val body = new java.io.ByteArrayOutputStream()
        var more = true
        while (more) {
          val o1 = u8()
          if (o1 < 192) { body.write(data, pos, o1); pos += o1; more = false }
          else if (o1 <= 223) {
            val l = ((o1 - 192) << 8) + u8() + 192
            body.write(data, pos, l); pos += l; more = false
          } else if (o1 == 255) {
            val l = (u8() << 24) | (u8() << 16) | (u8() << 8) | u8()
            body.write(data, pos, l); pos += l; more = false
          } else { // partial length 224..254
            val l = 1 << (o1 & 0x1F)
            body.write(data, pos, l); pos += l // continue reading lengths
          }
        }
        (tag, body.toByteArray)
      } else { // old format
        val tag = (first >> 2) & 0x0F
        val l = (first & 3) match {
          case 0 => u8()
          case 1 => (u8() << 8) | u8()
          case 2 => (u8() << 24) | (u8() << 16) | (u8() << 8) | u8()
          case 3 => data.length - pos // indeterminate: to end of input
        }
        val body = java.util.Arrays.copyOfRange(data, pos, pos + l)
        pos += l
        (tag, body)
      }
    }
  }

  // ---- armor (§6) ----
  private def crc24(data: Array[Byte]): Int = {
    var crc = 0xB704CE
    data.foreach { b =>
      crc ^= (b & 0xFF) << 16
      var i = 0
      while (i < 8) {
        crc <<= 1
        if ((crc & 0x1000000) != 0) crc ^= 0x1864CFB
        i += 1
      }
    }
    crc & 0xFFFFFF
  }

  private[operators] def armor(data: Array[Byte]): Array[Byte] = {
    val b64 = java.util.Base64.getEncoder.encodeToString(data)
    val lines = b64.grouped(64).mkString("\n")
    val crcB = Array(((crc24(data) >> 16) & 0xFF).toByte,
      ((crc24(data) >> 8) & 0xFF).toByte, (crc24(data) & 0xFF).toByte)
    val crc = java.util.Base64.getEncoder.encodeToString(crcB)
    s"-----BEGIN PGP MESSAGE-----\n\n$lines\n=$crc\n-----END PGP MESSAGE-----\n"
      .getBytes("US-ASCII")
  }

  private[operators] def dearmor(text: String): Array[Byte] = {
    val lines = text.linesIterator.toArray
    val begin = lines.indexWhere(_.startsWith("-----BEGIN PGP"))
    require(begin >= 0, "PGP: no armor header")
    // skip armor headers up to the blank line (may be absent)
    var i = begin + 1
    while (i < lines.length && lines(i).nonEmpty && lines(i).contains(":")) i += 1
    if (i < lines.length && lines(i).isEmpty) i += 1
    val body = new StringBuilder
    var crcLine: Option[String] = None
    while (i < lines.length && !lines(i).startsWith("-----END")) {
      val l = lines(i).trim
      if (l.startsWith("=")) crcLine = Some(l.drop(1))
      else body.append(l)
      i += 1
    }
    val data = java.util.Base64.getDecoder.decode(body.toString)
    crcLine.foreach { c =>
      val want = java.util.Base64.getDecoder.decode(c)
      val got = crc24(data)
      require(((want(0) & 0xFF) << 16 | (want(1) & 0xFF) << 8 | (want(2) & 0xFF)) == got,
        "PGP: armor CRC24 mismatch")
    }
    data
  }

  // ---- encrypt ----
  private val CountOctet = 0xE7 // (16+7) << (14+6) ≈ 24M bytes hashed — gpg-era work factor

  /** Deterministic per-passphrase salt: the expensive S2K then runs
    * ONCE per passphrase (the expression caches the derived key per
    * task), not once per row — the per-MESSAGE randomizer is the CFB
    * prefix block, which is exactly the role RFC 4880 §5.13 gives it
    * (zero IV + pseudo-random first plaintext block).
    *
    * The salt is derived THROUGH the full iterated S2K against a fixed
    * public salt (r16, ADVICE): the salt is published in the SKESK
    * packet, so a cheap derivation (one SHA-256) would let an attacker
    * test candidate passphrases against the public salt at one hash
    * each, bypassing the ~24 MB work factor CountOctet imposes.
    * Deriving it through the same-count S2K makes a salt-check cost
    * exactly as much as a key-check. Known residual property, accepted
    * for oracle determinism: two messages under the SAME passphrase
    * share a salt and are therefore linkable; callers needing
    * unlinkability should vary the passphrase per corpus. */
  private val SaltSeed = "graftPGP".getBytes("US-ASCII") // fixed 8-byte public seed salt
  private[graft] def sessionSalt(pass: Array[Byte]): Array[Byte] =
    java.util.Arrays.copyOfRange(
      s2k(pass, SaltSeed, decodeCount(CountOctet), HashSha256, 8), 0, 8)

  private[graft] def sessionKey(pass: Array[Byte], salt: Array[Byte]): Array[Byte] =
    s2k(pass, salt, decodeCount(CountOctet), HashSha256, keyBytes(CipherAes256))

  /** Encrypt `data` under `passphrase` (SKESK + SEIPD v1 + MDC,
    * AES-256, S2K iterated+salted SHA-256, uncompressed literal —
    * legal OpenPGP that any implementation, gpg included, decrypts). */
  def encryptSym(data: Array[Byte], passphrase: String,
                 fileName: String = "", armored: Boolean = false): Array[Byte] = {
    val pass = passphrase.getBytes("UTF-8")
    val salt = sessionSalt(pass)
    encryptWith(data, pass, salt, sessionKey(pass, salt), fileName, armored)
  }

  private[graft] def encryptWith(data: Array[Byte], pass: Array[Byte],
                                 salt: Array[Byte], key: Array[Byte],
                                 fileName: String, armored: Boolean): Array[Byte] = {
    // per-message pseudo-random prefix: SHA-256(pass ‖ 0x00 ‖ data)
    val seed = {
      val md = MessageDigest.getInstance("SHA-256")
      md.update(pass); md.update(0.toByte); md.update(data)
      md.digest()
    }
    // SKESK v4: version, cipher, s2k(type 3, hash, salt, count)
    val skeskBody = Array[Byte](4, CipherAes256.toByte, 3, HashSha256.toByte) ++
      salt :+ CountOctet.toByte
    val skesk = newHeader(3, skeskBody.length) ++ skeskBody

    // literal packet: 'b', fname, date 0 (deterministic)
    val fn = fileName.getBytes("UTF-8").take(255)
    val litBody = Array[Byte]('b'.toByte, fn.length.toByte) ++ fn ++
      Array[Byte](0, 0, 0, 0) ++ data
    val literal = newHeader(11, litBody.length) ++ litBody

    // plaintext = prefix(bs + 2 repeated) ‖ literal ‖ MDC(D3 14 ‖ sha1)
    val bs = 16
    val prefix = new Array[Byte](bs + 2)
    System.arraycopy(seed, 0, prefix, 0, bs) // deterministic "random" block
    prefix(bs) = prefix(bs - 2); prefix(bs + 1) = prefix(bs - 1)
    val mdcInput = prefix ++ literal ++ Array[Byte](0xD3.toByte, 0x14)
    val sha1 = MessageDigest.getInstance("SHA-1").digest(mdcInput)
    val plain = mdcInput ++ sha1

    val cipher = Cipher.getInstance("AES/CFB/NoPadding")
    cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
      new IvParameterSpec(new Array[Byte](bs))) // zero IV per §5.13
    val ct = cipher.doFinal(plain)
    val seipdBody = Array[Byte](1) ++ ct
    val msg = skesk ++ newHeader(18, seipdBody.length) ++ seipdBody
    if (armored) armor(msg) else msg
  }

  // ---- decrypt ----
  /** Decrypt an OpenPGP symmetric message (binary or armored) —
    * accepts stock `gpg --symmetric` output: SHA-1/SHA-256 S2K,
    * AES-128/192/256, ZIP/ZLIB compression, partial lengths. Throws
    * IllegalArgumentException with a specific reason on wrong
    * passphrase (prefix check), tamper (MDC), or unsupported
    * algorithms — never returns garbage silently. */
  def decryptSym(msg0: Array[Byte], passphrase: String): Array[Byte] =
    decryptSym(msg0, passphrase, null)

  /** As above, with an optional caller-owned S2K memo: the iterated S2K
    * hashes ~24 MB per derivation, and a column of messages produced
    * under one passphrase shares one (hash, salt, count) tuple — memoize
    * it per task (see [[graft.plans.PgpDecrypt]]) and the KDF runs once
    * where the naive form pays it per row. Derivation is pure, so a
    * benign compute-twice race in the map is harmless. */
  def decryptSym(msg0: Array[Byte], passphrase: String,
                 s2kMemo: scala.collection.concurrent.Map[(Int, String, Long, Int), Array[Byte]]): Array[Byte] = {
    val looksArmored = {
      val head = new String(msg0.take(64), "US-ASCII")
      head.contains("-----BEGIN PGP")
    }
    val msg = if (looksArmored) dearmor(new String(msg0, "US-ASCII")) else msg0
    val r = new PacketReader(msg)
    var keys = List.empty[(Int, Array[Byte])] // (cipherAlgo, key) per SKESK
    while (r.hasNext) {
      val (tag, body) = r.next()
      tag match {
        case 3 => // SKESK
          require(body(0) == 4, s"PGP: SKESK version ${body(0)} unsupported")
          val cipherAlgo = body(1) & 0xFF
          val s2kType = body(2) & 0xFF
          val hashAlgo = body(3) & 0xFF
          val (salt, count) = s2kType match {
            case 3 => (java.util.Arrays.copyOfRange(body, 4, 12),
              decodeCount(body(12) & 0xFF))
            case 1 => (java.util.Arrays.copyOfRange(body, 4, 12),
              math.max(8L + passphrase.getBytes("UTF-8").length, 0L)) // salted: one pass
            case 0 => (Array.empty[Byte], passphrase.getBytes("UTF-8").length.toLong)
            case other => throw new IllegalArgumentException(s"PGP: S2K type $other unsupported")
          }
          val kLen = keyBytes(cipherAlgo)
          def derive(): Array[Byte] =
            s2k(passphrase.getBytes("UTF-8"), salt, count, hashAlgo, kLen)
          val key =
            if (s2kMemo == null) derive()
            else s2kMemo.getOrElseUpdate(
              (hashAlgo, salt.map("%02x".format(_)).mkString, count, kLen), derive())
          // v4 SKESK may carry an ESK (encrypted session key) after the
          // S2K — not produced by gpg --symmetric defaults; reject loudly
          val s2kLen = s2kType match { case 3 => 11; case 1 => 10; case 0 => 2 }
          require(body.length <= 2 + s2kLen,
            "PGP: SKESK with encrypted session key unsupported (expected direct S2K key)")
          keys ::= (cipherAlgo, key)
        case 18 => // SEIPD v1
          require(keys.nonEmpty, "PGP: SEIPD before any SKESK")
          require(body(0) == 1, s"PGP: SEIPD version ${body(0)} unsupported")
          val ct = java.util.Arrays.copyOfRange(body, 1, body.length)
          // try each SKESK key (gpg can emit several)
          val errs = scala.collection.mutable.ArrayBuffer.empty[String]
          keys.reverse.foreach { case (algo, key) =>
            tryDecryptSeipd(ct, key) match {
              case Right(plain) => return parseInner(plain)
              case Left(e) => errs += e
            }
          }
          throw new IllegalArgumentException(
            s"PGP: decryption failed (${errs.mkString("; ")}) — wrong passphrase?")
        case 9 =>
          throw new IllegalArgumentException(
            "PGP: legacy SED (tag 9, no MDC) refused — re-encrypt with MDC")
        case _ => () // marker/trust/etc: skip
      }
    }
    throw new IllegalArgumentException("PGP: no encrypted data packet found")
  }

  private def tryDecryptSeipd(ct: Array[Byte], key: Array[Byte]): Either[String, Array[Byte]] = {
    val bs = 16
    val cipher = Cipher.getInstance("AES/CFB/NoPadding")
    cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new IvParameterSpec(new Array[Byte](bs)))
    val plain = cipher.doFinal(ct)
    if (plain.length < bs + 2 + 22) return Left("ciphertext too short")
    if (plain(bs) != plain(bs - 2) || plain(bs + 1) != plain(bs - 1))
      return Left("prefix check failed")
    // MDC: last 22 bytes are D3 14 sha1(everything before the sha1)
    val n = plain.length
    if (plain(n - 22) != 0xD3.toByte || plain(n - 21) != 0x14.toByte)
      return Left("MDC packet missing")
    val want = java.util.Arrays.copyOfRange(plain, n - 20, n)
    val got = MessageDigest.getInstance("SHA-1")
      .digest(java.util.Arrays.copyOfRange(plain, 0, n - 20))
    if (!java.util.Arrays.equals(want, got)) return Left("MDC mismatch (tampered)")
    Right(java.util.Arrays.copyOfRange(plain, bs + 2, n - 22))
  }

  /** The decrypted payload packets: literal, possibly wrapped in
    * Compressed Data (recursed). */
  private def parseInner(data: Array[Byte]): Array[Byte] = {
    val r = new PacketReader(data)
    while (r.hasNext) {
      val (tag, body) = r.next()
      tag match {
        case 11 => // literal: fmt, fnameLen, fname, date4, data
          val fnLen = body(1) & 0xFF
          return java.util.Arrays.copyOfRange(body, 2 + fnLen + 4, body.length)
        case 8 => // compressed: algo, data
          val algo = body(0) & 0xFF
          val packed = java.util.Arrays.copyOfRange(body, 1, body.length)
          val inflated = algo match {
            case 1 => inflate(packed, raw = true) // ZIP = raw deflate
            case 2 => inflate(packed, raw = false) // ZLIB
            case other => throw new IllegalArgumentException(
              s"PGP: compression algo $other unsupported")
          }
          return parseInner(inflated)
        case _ => () // one-pass signature etc.: skip
      }
    }
    throw new IllegalArgumentException("PGP: no literal data packet in message")
  }

  private def inflate(data: Array[Byte], raw: Boolean): Array[Byte] = {
    val inf = new java.util.zip.Inflater(raw)
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n)
      else if (n == 0 && inf.needsDictionary())
        throw new IllegalArgumentException("PGP: deflate dictionary unsupported")
    }
    inf.end()
    out.toByteArray
  }

  // ---- Spark operators ----
  /** EncryptContentPGP: payload column → OpenPGP message column.
    * Narrow per-row byte work via the native expression. */
  def encryptPgp(df: DataFrame, contentCol: String, passphrase: String,
                 armored: Boolean = false, outCol: String = "pgp"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    df.withColumn(outCol, ColumnBridge.column(graft.plans.PgpEncrypt(
      ColumnBridge.expression(col(contentCol).cast("binary")),
      graft.plans.Secret(passphrase), armored)))
  }

  /** DecryptContentPGP: OpenPGP message column → payload column.
    * Malformed/wrong-pass payloads yield NULL (route on it for NiFi's
    * failure relationship) — decryption failures are data, not task
    * crashes. */
  def decryptPgp(df: DataFrame, contentCol: String, passphrase: String,
                 outCol: String = "decrypted"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    df.withColumn(outCol, ColumnBridge.column(graft.plans.PgpDecrypt(
      ColumnBridge.expression(col(contentCol).cast("binary")),
      graft.plans.Secret(passphrase))))
  }
}
