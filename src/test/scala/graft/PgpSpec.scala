package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Pgp

/** RFC 4880 symmetric OpenPGP, gated by REAL GnuPG interop in both
  * directions (the MQTT/AMQP live-wire discipline, with gpg as the
  * independent peer): graft output must decrypt under `gpg`, and
  * stock `gpg --symmetric` output — ZIP-compressed literal,
  * partial-length framing, gpg's own S2K choices — must decrypt
  * here. Plus the failure contracts: wrong passphrase, MDC tamper,
  * legacy no-MDC refusal, armor CRC. */
class PgpSpec extends SparkSpec {
  import spark.implicits._

  private val gpgBin = new java.io.File("/usr/bin/gpg")
  private def gpgHome = {
    val d = Files.createTempDirectory("graft_gnupg")
    java.nio.file.Files.setPosixFilePermissions(d,
      java.util.EnumSet.of(java.nio.file.attribute.PosixFilePermission.OWNER_READ,
        java.nio.file.attribute.PosixFilePermission.OWNER_WRITE,
        java.nio.file.attribute.PosixFilePermission.OWNER_EXECUTE))
    d
  }

  private def runGpg(home: java.nio.file.Path, args: Seq[String],
                     stdin: Array[Byte] = Array.empty): (Int, Array[Byte], String) = {
    val cmd = Seq(gpgBin.getPath, "--homedir", home.toString, "--batch", "--yes",
      "--pinentry-mode", "loopback") ++ args
    val pb = new ProcessBuilder(cmd: _*)
    val p = pb.start()
    if (stdin.nonEmpty) { p.getOutputStream.write(stdin) }
    p.getOutputStream.close()
    val out = p.getInputStream.readAllBytes()
    val err = new String(p.getErrorStream.readAllBytes(), "UTF-8")
    val rc = p.waitFor()
    (rc, out, err)
  }

  // binary-safe payload: every byte value + some text
  private val payload: Array[Byte] =
    (0 until 600).map(i => (i % 256).toByte).toArray ++
      "graft pgp interop payload\n".getBytes("UTF-8")

  test("self round trip: binary + armored, deterministic bytes, binary-safe") {
    val enc = Pgp.encryptSym(payload, "s3cret")
    assert(java.util.Arrays.equals(Pgp.decryptSym(enc, "s3cret"), payload))
    // deterministic: same (pass, payload) → same bytes (retry-safe)
    assert(java.util.Arrays.equals(enc, Pgp.encryptSym(payload, "s3cret")))
    val armored = Pgp.encryptSym(payload, "s3cret", armored = true)
    val text = new String(armored, "US-ASCII")
    assert(text.startsWith("-----BEGIN PGP MESSAGE-----"))
    assert(java.util.Arrays.equals(Pgp.decryptSym(armored, "s3cret"), payload))
  }

  test("failure contracts: wrong passphrase, MDC tamper, armor CRC, legacy refusal") {
    val enc = Pgp.encryptSym(payload, "right")
    val e1 = intercept[IllegalArgumentException](Pgp.decryptSym(enc, "wrong"))
    assert(e1.getMessage.contains("wrong passphrase"))
    // flip one ciphertext byte near the end (inside the MDC region)
    val tampered = enc.clone(); tampered(tampered.length - 5) =
      (tampered(tampered.length - 5) ^ 0x40).toByte
    val e2 = intercept[IllegalArgumentException](Pgp.decryptSym(tampered, "right"))
    assert(e2.getMessage.toLowerCase.contains("mdc") ||
      e2.getMessage.contains("wrong passphrase"))
    // armor CRC mismatch is detected before any crypto
    val arm = new String(Pgp.encryptSym(payload, "right", armored = true), "US-ASCII")
    val bad = arm.replaceFirst("\n=", "\n=AAAA\n=").replaceFirst("=AAAA\n=(....)", "=AAAA")
    // simpler: corrupt one base64 body char instead
    val lines = arm.linesIterator.toArray
    val bodyIdx = lines.indexWhere(l => l.length > 40 && !l.startsWith("-"))
    lines(bodyIdx) = (if (lines(bodyIdx)(0) == 'A') "B" else "A") + lines(bodyIdx).drop(1)
    val e3 = intercept[IllegalArgumentException](
      Pgp.decryptSym(lines.mkString("\n").getBytes("US-ASCII"), "right"))
    assert(e3.getMessage.contains("CRC") || e3.getMessage.contains("wrong passphrase"))
  }

  test("gpg decrypts graft output (binary and armored)") {
    assume(gpgBin.exists)
    val home = gpgHome
    Seq(false, true).foreach { arm =>
      val enc = Pgp.encryptSym(payload, "interop-pass", armored = arm)
      val f = Files.createTempFile("graft_pgp", if (arm) ".asc" else ".pgp")
      Files.write(f, enc)
      val (rc, out, err) = runGpg(home,
        Seq("--passphrase", "interop-pass", "--decrypt", f.toString))
      assert(rc == 0, s"gpg rc=$rc: $err")
      assert(java.util.Arrays.equals(out, payload),
        s"gpg-decrypted bytes differ (armored=$arm)")
    }
  }

  test("graft decrypts stock gpg --symmetric output (compressed, partial lengths, armor)") {
    assume(gpgBin.exists)
    val home = gpgHome
    val in = Files.createTempFile("graft_pgp_in", ".bin")
    Files.write(in, payload)
    // gpg defaults: AES256 + ZIP compression + partial-length SEIPD
    val outF = Files.createTempFile("graft_pgp_gpg", ".gpg")
    val (rc1, _, err1) = runGpg(home, Seq("--passphrase", "interop-pass",
      "--symmetric", "--cipher-algo", "AES256", "--output", outF.toString,
      in.toString))
    assert(rc1 == 0, err1)
    assert(java.util.Arrays.equals(
      Pgp.decryptSym(Files.readAllBytes(outF), "interop-pass"), payload))
    // armored form exercises dearmor + CRC on real gpg output
    val outA = Files.createTempFile("graft_pgp_gpg", ".asc")
    val (rc2, _, err2) = runGpg(home, Seq("--passphrase", "interop-pass",
      "--armor", "--symmetric", "--output", outA.toString, in.toString))
    assert(rc2 == 0, err2)
    assert(java.util.Arrays.equals(
      Pgp.decryptSym(Files.readAllBytes(outA), "interop-pass"), payload))
    // and a different cipher: AES-128 exercises the key-size dispatch
    val out128 = Files.createTempFile("graft_pgp_gpg", ".gpg")
    val (rc3, _, err3) = runGpg(home, Seq("--passphrase", "interop-pass",
      "--symmetric", "--cipher-algo", "AES128", "--output", out128.toString,
      in.toString))
    assert(rc3 == 0, err3)
    assert(java.util.Arrays.equals(
      Pgp.decryptSym(Files.readAllBytes(out128), "interop-pass"), payload))
  }

  test("Spark operators: round trip, null failure rows, native plan nodes, flow vocabulary") {
    val df = spark.range(3).select(col("id"),
      concat(lit("payload-"), col("id")).cast("binary").as("content"))
    val enc = Pgp.encryptPgp(df, "content", "pass1")
    val plan = enc.queryExecution.executedPlan.toString
    assert(plan.contains("graft_pgp_encrypt"), plan)
    val dec = Pgp.decryptPgp(enc, "pgp", "pass1")
      .select(col("id"), col("decrypted").cast("string"))
      .as[(Long, String)].collect().toMap
    assert(dec == Map(0L -> "payload-0", 1L -> "payload-1", 2L -> "payload-2"))
    // wrong passphrase → null rows, not task failures
    val bad = Pgp.decryptPgp(enc, "pgp", "nope")
      .select("decrypted").collect()
    assert(bad.forall(_.isNullAt(0)))
    // flow vocabulary both directions
    val flow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "e", "type": "EncryptContentPGP",
        |     "properties": {"Passphrase": "fp", "Armor": "true"}},
        |    {"identifier": "d", "type": "DecryptContentPGP",
        |     "properties": {"Content Column": "pgp", "Passphrase": "fp"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "e"}},
        |    {"source": {"id": "e"}, "destination": {"id": "d"}},
        |    {"source": {"id": "d"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val out = FlowCompiler.compile(spark, flow, Map("in" -> df))("out")
      .select(col("decrypted").cast("string")).as[String].collect().sorted
    assert(out.toSeq == Seq("payload-0", "payload-1", "payload-2"))
  }
}
