package graft.sources

import java.io.FileInputStream
import java.nio.file.Files
import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/** Test-only TLS material for the loopback peers: ONE self-signed
  * RSA cert for CN=127.0.0.1 (SAN IP pinned so java.net.http's hostname
  * verification passes against the loopback dial), generated once per
  * JVM with the JDK's own keytool — no fixture files checked in, no
  * third-party crypto libs. The SAME keystore backs both ends:
  * key managers for the server sockets, trust managers for the clients
  * (the keystore's cert chain IS the trust anchor), so the tests
  * exercise real TLS handshakes without touching JVM-global defaults.
  */
object TlsTestKit {
  private val storePass = "loopback".toCharArray

  lazy val context: SSLContext = {
    val dir = Files.createTempDirectory("graft_tls")
    val ks = dir.resolve("loopback.p12").toString
    val keytool = new java.io.File(
      s"${System.getProperty("java.home")}/bin/keytool")
    require(keytool.canExecute, s"keytool not found at $keytool")
    val p = new ProcessBuilder(
      keytool.getAbsolutePath, "-genkeypair", "-alias", "loopback",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "3650",
      "-keystore", ks, "-storetype", "PKCS12",
      "-storepass", new String(storePass),
      "-dname", "CN=127.0.0.1", "-ext", "SAN=IP:127.0.0.1")
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    require(p.waitFor() == 0, s"keytool failed: $out")
    val store = KeyStore.getInstance("PKCS12")
    val in = new FileInputStream(ks)
    try store.load(in, storePass) finally in.close()
    val kmf = KeyManagerFactory.getInstance(
      KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(store, storePass)
    val tmf = TrustManagerFactory.getInstance(
      TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(store)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tmf.getTrustManagers, null)
    ctx
  }
}
