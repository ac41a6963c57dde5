package graft

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, RandomAccessFile}
import java.math.BigInteger
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.file.{Files, Path}
import java.security.{KeyFactory, KeyPair, KeyPairGenerator, MessageDigest, SecureRandom, Signature}
import java.security.interfaces.ECPublicKey
import java.security.spec.{ECGenParameterSpec, ECPoint, ECPublicKeySpec}
import java.util.concurrent.LinkedBlockingQueue
import javax.crypto.{Cipher, KeyAgreement, Mac}
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** Minimal in-process SSH-2 + SFTP-v3 server (JDK crypto only) — the
  * SFTP analog of [[MiniFtpServer]], so hadoop's UNMODIFIED
  * `SFTPFileSystem` + the jsch client can be proven against a live
  * server with zero egress. Implements just enough of the public
  * protocol stack:
  *
  *  - RFC 4253 transport: version exchange, binary packet protocol,
  *    KEXINIT negotiation offering exactly one algorithm per slot —
  *    `ecdh-sha2-nistp256` KEX (RFC 5656 §4, JDK `KeyAgreement(ECDH)`),
  *    `ssh-ed25519` host key (RFC 8709, JDK 17 `Signature(Ed25519)`),
  *    `aes128-ctr` both ways (RFC 4344), `hmac-sha2-256` both ways
  *    (RFC 6668), no compression. Key derivation per RFC 4253 §7.2.
  *  - RFC 4252 userauth: `none` probe answered with a `password`
  *    continue-list, then password auth against the fixed credentials.
  *  - RFC 4254 connection: one `session` channel, `sftp` subsystem,
  *    window accounting both directions (the server tops up its
  *    receive window and respects the client's for DATA replies).
  *  - SFTP v3 (draft-ietf-secsh-filexfer-02, what every deployed
  *    OpenSSH/jsch speaks): INIT/VERSION, REALPATH, STAT/LSTAT/FSTAT,
  *    OPENDIR/READDIR, OPEN/READ/WRITE/CLOSE (offset-addressed),
  *    REMOVE, MKDIR, RMDIR, RENAME (fails on existing target, v3
  *    semantics), SETSTAT/FSETSTAT (accepted, attrs ignored — chmod on
  *    a local jail is meaningless).
  *
  * Files live under a caller-supplied local root, path-jailed exactly
  * like the FTP server. One handler thread per connection plus one
  * SFTP worker, so pipelined READ/READDIR requests (jsch issues many
  * in flight) are answered in order while the reader keeps consuming
  * window adjusts. Test infrastructure — the PRODUCT side is the
  * unmodified Hadoop FileSystem path, same contract as FtpSpec. */
final class MiniSftpServer(root: Path, val user: String = "u", val pass: String = "p") {
  private val control = new ServerSocket(0, 50, InetAddress.getLoopbackAddress)
  @volatile private var running = true
  def port: Int = control.getLocalPort

  // one host identity per server lifetime, like a real sshd
  private val hostKey: KeyPair = {
    val kpg = KeyPairGenerator.getInstance("Ed25519")
    kpg.generateKeyPair()
  }
  // raw 32-byte Ed25519 public key = tail of the X.509 SPKI encoding
  private val hostPubRaw: Array[Byte] = hostKey.getPublic.getEncoded.takeRight(32)

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = control.accept()
        val t = new Thread(() => new Conn(s).run(), "minisftp-session")
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => /* closed */ }
    }
  }, "minisftp-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = { running = false; try control.close() catch { case _: Exception => () } }

  // ------------------------------------------------------------ wire utils

  private object W {
    def u32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
            ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u64(v: Long): Array[Byte] = u32(v >>> 32) ++ u32(v & 0xffffffffL)
    def str(b: Array[Byte]): Array[Byte] = u32(b.length.toLong) ++ b
    def str(s: String): Array[Byte] = str(s.getBytes("UTF-8"))
    def mpint(i: BigInteger): Array[Byte] = str(i.toByteArray) // positive: minimal two's-complement
  }

  private final class Reader(buf: Array[Byte]) {
    private var pos = 0
    def u8(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    def bool(): Boolean = u8() != 0
    def u32(): Long = { (u8().toLong << 24) | (u8().toLong << 16) | (u8().toLong << 8) | u8().toLong }
    def u64(): Long = (u32() << 32) | u32()
    def bytes(n: Int): Array[Byte] = { val v = buf.slice(pos, pos + n); pos += n; v }
    def str(): Array[Byte] = bytes(u32().toInt)
    def utf(): String = new String(str(), "UTF-8")
    def remaining: Int = buf.length - pos
  }

  private def sha256(parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-256")
    parts.foreach(md.update)
    md.digest()
  }

  // --------------------------------------------------------- the connection

  private final class Conn(sock: Socket) {
    private val in = new BufferedInputStream(sock.getInputStream, 64 * 1024)
    private val out = new BufferedOutputStream(sock.getOutputStream, 64 * 1024)
    private val rnd = new SecureRandom()

    private var seqIn = 0L
    private var seqOut = 0L
    private var decrypt: Cipher = _
    private var encrypt: Cipher = _
    private var macIn: Mac = _
    private var macOut: Mac = _

    private val VS = "SSH-2.0-graft_minisftp"
    private var vc: String = _
    private var clientKexinit: Array[Byte] = _
    private var serverKexinit: Array[Byte] = _

    // connection-protocol state
    private var clientChannel = -1L
    @volatile private var remoteWindow = 0L
    private var remoteMaxPacket = 32768L
    private val windowLock = new Object
    private var receivedSinceAdjust = 0L

    // sftp worker feed: raw CHANNEL_DATA payloads; null = poison
    private val sftpIn = new LinkedBlockingQueue[Array[Byte]]()

    def run(): Unit = {
      try {
        out.write((VS + "\r\n").getBytes("UTF-8")); out.flush()
        vc = readVersionLine()
        require(vc.startsWith("SSH-2.0-"), s"not an SSH-2 client: $vc")
        sendKexinit()
        transportLoop()
      } catch {
        case _: EOFException => ()
        case _: java.net.SocketException => ()
        case e: Exception =>
          System.err.println(s"[minisftp] session error: ${e.getMessage}")
      } finally {
        sftpIn.put(Array.emptyByteArray) // poison, len-0
        try sock.close() catch { case _: Exception => () }
      }
    }

    private def readVersionLine(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != '\n' && c >= 0) { if (c != '\r') sb.append(c.toChar); c = in.read() }
      if (c < 0) throw new EOFException
      sb.toString
    }

    private def readN(n: Int): Array[Byte] = {
      val b = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(b, off, n - off)
        if (r < 0) throw new EOFException
        off += r
      }
      b
    }

    private def readPacket(): Array[Byte] = {
      val payload =
        if (decrypt == null) {
          val len = new Reader(readN(4)).u32().toInt
          require(len >= 5 && len < (1 << 20), s"bad packet length $len")
          val body = readN(len)
          val padLen = body(0) & 0xff
          body.slice(1, len - padLen)
        } else {
          val first = decrypt.update(readN(16))
          val len = new Reader(first).u32().toInt
          require(len >= 5 && len < (1 << 20), s"bad packet length $len")
          val rest = decrypt.update(readN(len + 4 - 16))
          val clear = first ++ rest
          val macGot = readN(32)
          macIn.reset()
          macIn.update(W.u32(seqIn))
          macIn.update(clear)
          require(java.util.Arrays.equals(macIn.doFinal(), macGot),
            s"MAC mismatch on inbound packet $seqIn")
          val padLen = clear(4) & 0xff
          clear.slice(5, 4 + len - padLen)
        }
      seqIn = (seqIn + 1) & 0xffffffffL
      payload
    }

    private def writePacket(payload: Array[Byte]): Unit = synchronized {
      val block = if (encrypt == null) 8 else 16
      var pad = block - ((5 + payload.length) % block)
      if (pad < 4) pad += block
      val padding = new Array[Byte](pad)
      rnd.nextBytes(padding)
      val clear = W.u32((payload.length + pad + 1).toLong) ++
        Array(pad.toByte) ++ payload ++ padding
      if (encrypt == null) out.write(clear)
      else {
        macOut.reset()
        macOut.update(W.u32(seqOut))
        macOut.update(clear)
        val tag = macOut.doFinal()
        out.write(encrypt.update(clear))
        out.write(tag)
      }
      out.flush()
      seqOut = (seqOut + 1) & 0xffffffffL
    }

    // ---------------------------------------------------------------- KEX

    private def nameList(s: String): Array[Byte] = W.str(s)

    private def sendKexinit(): Unit = {
      val cookie = new Array[Byte](16)
      rnd.nextBytes(cookie)
      serverKexinit = Array(20.toByte) ++ cookie ++
        nameList("ecdh-sha2-nistp256") ++
        nameList("ssh-ed25519") ++
        nameList("aes128-ctr") ++ nameList("aes128-ctr") ++
        nameList("hmac-sha2-256") ++ nameList("hmac-sha2-256") ++
        nameList("none") ++ nameList("none") ++
        nameList("") ++ nameList("") ++
        Array(0.toByte) ++ W.u32(0L)
      writePacket(serverKexinit)
    }

    private def doEcdh(payload: Array[Byte]): Unit = {
      val r = new Reader(payload)
      r.u8() // type 30
      val qc = r.str()
      require(qc.length == 65 && qc(0) == 4, "expected uncompressed nistp256 point")
      val kpg = KeyPairGenerator.getInstance("EC")
      kpg.initialize(new ECGenParameterSpec("secp256r1"))
      val kp = kpg.generateKeyPair()
      val pub = kp.getPublic.asInstanceOf[ECPublicKey]
      def fix32(i: BigInteger): Array[Byte] = {
        val b = i.toByteArray.dropWhile(_ == 0)
        new Array[Byte](32 - b.length) ++ b
      }
      val qs = Array(4.toByte) ++ fix32(pub.getW.getAffineX) ++ fix32(pub.getW.getAffineY)
      val clientPub = KeyFactory.getInstance("EC").generatePublic(
        new ECPublicKeySpec(
          new ECPoint(new BigInteger(1, qc.slice(1, 33)), new BigInteger(1, qc.slice(33, 65))),
          pub.getParams))
      val ka = KeyAgreement.getInstance("ECDH")
      ka.init(kp.getPrivate)
      ka.doPhase(clientPub, true)
      val k = new BigInteger(1, ka.generateSecret())

      val ks = W.str("ssh-ed25519") ++ W.str(hostPubRaw)
      // exchange hash, RFC 5656 §4
      val h = sha256(W.str(vc), W.str(VS), W.str(clientKexinit), W.str(serverKexinit),
        W.str(ks), W.str(qc), W.str(qs), W.mpint(k))
      val signer = Signature.getInstance("Ed25519")
      signer.initSign(hostKey.getPrivate)
      signer.update(h)
      val sigBlob = W.str("ssh-ed25519") ++ W.str(signer.sign())
      writePacket(Array(31.toByte) ++ W.str(ks) ++ W.str(qs) ++ W.str(sigBlob))
      writePacket(Array(21.toByte)) // our NEWKEYS — next outbound packet is encrypted

      // RFC 4253 §7.2 key derivation; session id = H of the first kex
      val km = W.mpint(k)
      def kdf(x: Char, need: Int): Array[Byte] = {
        var acc = sha256(km, h, Array(x.toByte), h)
        while (acc.length < need) acc = acc ++ sha256(km, h, acc)
        acc.take(need)
      }
      val ivIn = kdf('A', 16); val ivOut = kdf('B', 16)
      val keyIn = kdf('C', 16); val keyOut = kdf('D', 16)
      val macKeyIn = kdf('E', 32); val macKeyOut = kdf('F', 32)
      encrypt = Cipher.getInstance("AES/CTR/NoPadding")
      encrypt.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(keyOut, "AES"), new IvParameterSpec(ivOut))
      macOut = Mac.getInstance("HmacSHA256")
      macOut.init(new SecretKeySpec(macKeyOut, "HmacSHA256"))
      // inbound side arms when the client's NEWKEYS arrives
      pendingDecrypt = Cipher.getInstance("AES/CTR/NoPadding")
      pendingDecrypt.init(Cipher.DECRYPT_MODE, new SecretKeySpec(keyIn, "AES"), new IvParameterSpec(ivIn))
      pendingMacIn = Mac.getInstance("HmacSHA256")
      pendingMacIn.init(new SecretKeySpec(macKeyIn, "HmacSHA256"))
    }
    private var pendingDecrypt: Cipher = _
    private var pendingMacIn: Mac = _

    // ------------------------------------------------------------ transport

    private def transportLoop(): Unit = {
      var sftpWorker: Thread = null
      while (true) {
        val p = readPacket()
        if (p.nonEmpty) (p(0) & 0xff) match {
          case 1 => return // DISCONNECT
          case 2 | 4 => () // IGNORE / DEBUG
          case 3 => () // UNIMPLEMENTED
          case 20 => clientKexinit = p
          case 30 => doEcdh(p)
          case 21 => // client NEWKEYS: inbound crypto armed from next packet
            decrypt = pendingDecrypt; macIn = pendingMacIn
          case 5 => // SERVICE_REQUEST
            val r = new Reader(p); r.u8()
            val svc = r.utf()
            writePacket(Array(6.toByte) ++ W.str(svc))
          case 50 => handleUserauth(p)
          case 80 => // GLOBAL_REQUEST
            val r = new Reader(p); r.u8(); r.utf()
            if (r.bool()) writePacket(Array(82.toByte))
          case 90 => // CHANNEL_OPEN
            val r = new Reader(p); r.u8()
            val tpe = r.utf()
            val sender = r.u32(); val win = r.u32(); val maxPkt = r.u32()
            if (tpe == "session" && clientChannel < 0) {
              clientChannel = sender
              windowLock.synchronized { remoteWindow = win }
              remoteMaxPacket = maxPkt
              writePacket(Array(91.toByte) ++ W.u32(sender) ++ W.u32(0L) ++
                W.u32((1L << 30)) ++ W.u32(32768L))
            } else {
              writePacket(Array(92.toByte) ++ W.u32(sender) ++ W.u32(1L) ++
                W.str("only one session channel") ++ W.str(""))
            }
          case 98 => // CHANNEL_REQUEST
            val r = new Reader(p); r.u8(); r.u32()
            val req = r.utf(); val wantReply = r.bool()
            if (req == "subsystem" && r.utf() == "sftp") {
              if (wantReply) writePacket(Array(99.toByte) ++ W.u32(clientChannel))
              sftpWorker = new Thread(() => sftpLoop(), "minisftp-worker")
              sftpWorker.setDaemon(true)
              sftpWorker.start()
            } else if (wantReply) writePacket(Array(100.toByte) ++ W.u32(clientChannel))
          case 93 => // CHANNEL_WINDOW_ADJUST
            val r = new Reader(p); r.u8(); r.u32()
            val add = r.u32()
            windowLock.synchronized { remoteWindow += add; windowLock.notifyAll() }
          case 94 => // CHANNEL_DATA
            val r = new Reader(p); r.u8(); r.u32()
            val data = r.str()
            receivedSinceAdjust += data.length
            if (receivedSinceAdjust > (1L << 28)) {
              writePacket(Array(93.toByte) ++ W.u32(clientChannel) ++ W.u32(receivedSinceAdjust))
              receivedSinceAdjust = 0L
            }
            sftpIn.put(data)
          case 96 => () // CHANNEL_EOF
          case 97 => // CHANNEL_CLOSE
            writePacket(Array(97.toByte) ++ W.u32(clientChannel))
            return
          case other =>
            // unknown message: SSH_MSG_UNIMPLEMENTED with its seq - 1
            writePacket(Array(3.toByte) ++ W.u32((seqIn - 1) & 0xffffffffL))
            System.err.println(s"[minisftp] unimplemented message type $other")
        }
      }
    }

    private def handleUserauth(p: Array[Byte]): Unit = {
      val r = new Reader(p); r.u8()
      val u = r.utf(); r.utf() // service
      val method = r.utf()
      val ok = method == "password" && {
        r.bool() // change-password flag
        u == user && r.utf() == pass
      }
      if (ok) writePacket(Array(52.toByte))
      else writePacket(Array(51.toByte) ++ W.str("password") ++ Array(0.toByte))
    }

    // -------------------------------------------------------------- SFTP v3

    private def sendChannelData(bytes: Array[Byte]): Unit = {
      var off = 0
      while (off < bytes.length) {
        val chunk = math.min(math.min(32000, bytes.length - off),
          (remoteMaxPacket - 64).toInt.max(1024))
        windowLock.synchronized {
          val deadline = System.currentTimeMillis() + 30000
          while (remoteWindow < chunk) {
            require(System.currentTimeMillis() < deadline, "window starvation")
            windowLock.wait(100)
          }
          remoteWindow -= chunk
        }
        writePacket(Array(94.toByte) ++ W.u32(clientChannel) ++
          W.str(bytes.slice(off, off + chunk)))
        off += chunk
      }
    }

    private def sftpReply(tpe: Int, body: Array[Byte]): Unit =
      sendChannelData(W.u32((1 + body.length).toLong) ++ Array(tpe.toByte) ++ body)

    private val OK = 0L; private val EOF = 1L; private val NO_FILE = 2L; private val FAIL = 4L
    private def status(id: Long, code: Long, msg: String): Unit =
      sftpReply(101, W.u32(id) ++ W.u32(code) ++ W.str(msg) ++ W.str("en"))

    /** Virtual-path jail, same discipline as the FTP server. */
    private def canon(virtual: String): String = {
      val segs = virtual.split("/").filter(s => s.nonEmpty && s != ".")
      val stack = scala.collection.mutable.ArrayBuffer.empty[String]
      segs.foreach {
        case ".." => if (stack.nonEmpty) stack.remove(stack.length - 1)
        case s => stack += s
      }
      "/" + stack.mkString("/")
    }
    private def resolve(virtual: String): Path =
      root.resolve(canon(virtual).stripPrefix("/")).normalize()

    private def attrsOf(p: Path): Array[Byte] = {
      val dir = Files.isDirectory(p)
      val size = if (dir) 4096L else Files.size(p)
      val mtime = Files.getLastModifiedTime(p).toMillis / 1000
      val perms = (if (dir) 0x4000 else 0x8000) | (if (dir) 0x1ed else 0x1a4) // 755 / 644
      W.u32(15L) ++ W.u64(size) ++ W.u32(0L) ++ W.u32(0L) ++
        W.u32(perms.toLong) ++ W.u32(mtime) ++ W.u32(mtime)
    }

    private def longname(p: Path, name: String): String = {
      val dir = Files.isDirectory(p)
      val size = if (dir) 4096L else Files.size(p)
      f"${if (dir) "d" else "-"}rw-r--r--   1 $user%-8s $user%-8s $size%8d Jan  1 00:00 $name"
    }

    private final case class FileH(raf: RandomAccessFile, append: Boolean)
    private val handles = scala.collection.mutable.Map.empty[String, AnyRef]
    private var handleSeq = 0

    private def sftpLoop(): Unit = {
      val acc = new java.io.ByteArrayOutputStream()
      var buf = Array.emptyByteArray
      var pos = 0
      def fill(): Boolean = {
        val chunk = sftpIn.take()
        if (chunk.isEmpty) return false // poison
        acc.write(chunk)
        true
      }
      try {
        while (true) {
          // compact + top up until one full packet is available
          buf = acc.toByteArray.drop(pos); acc.reset(); acc.write(buf); pos = 0
          while (acc.size - pos < 4) { if (!fill()) return }
          var whole = acc.toByteArray
          val len = new Reader(whole.slice(pos, pos + 4)).u32().toInt
          while (acc.size - pos < 4 + len) { if (!fill()) return }
          whole = acc.toByteArray
          handleSftpPacket(whole.slice(pos + 4, pos + 4 + len))
          pos += 4 + len
        }
      } catch {
        case _: InterruptedException => ()
        case e: Exception => System.err.println(s"[minisftp] worker error: ${e.getMessage}")
      } finally handles.values.foreach {
        case FileH(raf, _) => try raf.close() catch { case _: Exception => () }
        case _ => ()
      }
    }

    private def handleSftpPacket(pkt: Array[Byte]): Unit = {
      val r = new Reader(pkt)
      val tpe = r.u8()
      if (tpe == 1) { // INIT -> VERSION 3
        sftpReply(2, W.u32(3L))
        return
      }
      val id = r.u32()
      def guard(body: => Unit): Unit =
        try body catch {
          case _: java.nio.file.NoSuchFileException => status(id, NO_FILE, "no such file")
          case e: Exception => status(id, FAIL, String.valueOf(e.getMessage))
        }
      tpe match {
        case 16 => // REALPATH: canonicalize within the jail; dummy attrs (v3)
          val v = canon(r.utf())
          sftpReply(104, W.u32(id) ++ W.u32(1L) ++ W.str(v) ++ W.str(v) ++ W.u32(0L))
        case 7 | 17 => // LSTAT | STAT (no symlinks in the jail)
          guard {
            val p = resolve(r.utf())
            if (!Files.exists(p)) status(id, NO_FILE, "no such file")
            else sftpReply(105, W.u32(id) ++ attrsOf(p))
          }
        case 8 => // FSTAT
          guard {
            handles.get(new String(r.str(), "UTF-8")) match {
              case Some(FileH(raf, _)) =>
                sftpReply(105, W.u32(id) ++ W.u32(15L) ++ W.u64(raf.length()) ++
                  W.u32(0L) ++ W.u32(0L) ++ W.u32(0x81a4L) ++ W.u32(0L) ++ W.u32(0L))
              case _ => status(id, FAIL, "bad handle")
            }
          }
        case 9 | 10 => // SETSTAT | FSETSTAT: accepted, attrs ignored
          status(id, OK, "ok")
        case 11 => // OPENDIR
          guard {
            val p = resolve(r.utf())
            if (!Files.isDirectory(p)) status(id, NO_FILE, "not a directory")
            else {
              handleSeq += 1
              val h = s"d$handleSeq"
              val entries = Files.list(p).iterator()
              handles(h) = entries
              sftpReply(102, W.u32(id) ++ W.str(h))
            }
          }
        case 12 => // READDIR
          guard {
            val h = new String(r.str(), "UTF-8")
            handles.get(h) match {
              case Some(it: java.util.Iterator[_]) =>
                val batch = scala.collection.mutable.ArrayBuffer.empty[Path]
                while (it.hasNext && batch.size < 64)
                  batch += it.next().asInstanceOf[Path]
                if (batch.isEmpty) status(id, EOF, "end of dir")
                else {
                  val body = batch.flatMap { e =>
                    val n = e.getFileName.toString
                    (W.str(n) ++ W.str(longname(e, n)) ++ attrsOf(e)).toSeq
                  }.toArray
                  sftpReply(104, W.u32(id) ++ W.u32(batch.size.toLong) ++ body)
                }
              case _ => status(id, FAIL, "bad handle")
            }
          }
        case 3 => // OPEN
          guard {
            val p = resolve(r.utf())
            val flags = r.u32()
            val write = (flags & 2) != 0
            val append = (flags & 4) != 0
            val creat = (flags & 8) != 0
            val trunc = (flags & 16) != 0
            val excl = (flags & 32) != 0
            if (!write && !Files.exists(p)) status(id, NO_FILE, "no such file")
            else if (excl && Files.exists(p)) status(id, FAIL, "exists")
            else if (write && !creat && !Files.exists(p)) status(id, NO_FILE, "no such file")
            else {
              val raf = new RandomAccessFile(p.toFile, if (write) "rw" else "r")
              if (trunc) raf.setLength(0L)
              handleSeq += 1
              val h = s"f$handleSeq"
              handles(h) = FileH(raf, append)
              sftpReply(102, W.u32(id) ++ W.str(h))
            }
          }
        case 5 => // READ
          guard {
            val h = new String(r.str(), "UTF-8")
            val off = r.u64(); val want = r.u32().toInt
            handles.get(h) match {
              case Some(FileH(raf, _)) =>
                if (off >= raf.length()) status(id, EOF, "eof")
                else {
                  val n = math.min(want.toLong, raf.length() - off).toInt
                  val b = new Array[Byte](n)
                  raf.seek(off)
                  raf.readFully(b)
                  sftpReply(103, W.u32(id) ++ W.str(b))
                }
              case _ => status(id, FAIL, "bad handle")
            }
          }
        case 6 => // WRITE
          guard {
            val h = new String(r.str(), "UTF-8")
            val off = r.u64(); val data = r.str()
            handles.get(h) match {
              case Some(FileH(raf, append)) =>
                raf.seek(if (append) raf.length() else off)
                raf.write(data)
                status(id, OK, "ok")
              case _ => status(id, FAIL, "bad handle")
            }
          }
        case 4 => // CLOSE
          guard {
            val h = new String(r.str(), "UTF-8")
            handles.remove(h) match {
              case Some(FileH(raf, _)) => raf.close(); status(id, OK, "ok")
              case Some(_) => status(id, OK, "ok") // dir handle
              case None => status(id, FAIL, "bad handle")
            }
          }
        case 13 => // REMOVE
          guard {
            val p = resolve(r.utf())
            if (!Files.isRegularFile(p)) status(id, NO_FILE, "no such file")
            else { Files.delete(p); status(id, OK, "ok") }
          }
        case 14 => // MKDIR
          guard {
            val p = resolve(r.utf())
            if (Files.exists(p)) status(id, FAIL, "exists")
            else { Files.createDirectory(p); status(id, OK, "ok") }
          }
        case 15 => // RMDIR
          guard {
            val p = resolve(r.utf())
            if (!Files.isDirectory(p)) status(id, NO_FILE, "no such dir")
            else { Files.delete(p); status(id, OK, "ok") }
          }
        case 18 => // RENAME — v3 semantics: target must not exist
          guard {
            val src = resolve(r.utf()); val dst = resolve(r.utf())
            if (!Files.exists(src)) status(id, NO_FILE, "no such file")
            else if (Files.exists(dst)) status(id, FAIL, "target exists")
            else { Files.move(src, dst); status(id, OK, "ok") }
          }
        case other =>
          status(id, 8L /* OP_UNSUPPORTED */, s"unsupported sftp op $other")
      }
    }
  }
}
