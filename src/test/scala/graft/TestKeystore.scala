package graft

/** One self-signed PKCS12 keystore shared by every TLS gate in the
  * suite (generated once per JVM by the JDK's own keytool — the
  * ListenHttpSpec pattern, hoisted so the r17 TLS gates don't each pay
  * a keygen). The matching SSLContext trusts exactly this key, so a
  * client built from it refuses any other server and vice versa. */
object TestKeystore {
  val password = "graftpass"

  lazy val path: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_test_ks")
      .resolve("test.p12").toString
    val keytool = new ProcessBuilder(
      s"${System.getProperty("java.home")}/bin/keytool", "-genkeypair",
      "-alias", "graft", "-keyalg", "RSA", "-keysize", "2048",
      "-dname", "CN=localhost", "-validity", "1",
      "-ext", "san=ip:127.0.0.1,dns:localhost",
      "-storetype", "PKCS12", "-keystore", p, "-storepass", password)
      .redirectErrorStream(true).start()
    require(keytool.waitFor() == 0, "keytool must generate the keystore")
    p
  }

  def sslContext: javax.net.ssl.SSLContext =
    graft.streaming.ListenHttp.sslContext(path, password)
}
