package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable.ArrayBuffer

/** Test-only in-process AMQP 0-9-1 broker — decodes [[AmqpSink]]'s frames
  * per the published spec with its OWN parser (no shared encode/decode
  * helpers, so agreement between the two sides actually tests the wire
  * grammar), speaks the server half of the handshake, validates PLAIN
  * credentials, and records every queue.declare and delivered message
  * with its content properties.
  *
  * `dropAfterMessages`: kill the TCP socket abruptly after that many
  * basic deliveries on a connection — exercises the sink's re-dial path.
  */
final class LoopbackAmqpBroker(expectUser: String, expectPass: String,
    dropAfterMessages: Int = Int.MaxValue) {

  final case class Delivered(queue: String, body: String,
    contentType: String, deliveryMode: Int)
  final case class Declared(queue: String, durable: Boolean)

  val declares = new ArrayBuffer[Declared]()
  val messages = new ArrayBuffer[Delivered]()
  @volatile var connections = 0
  @volatile var authFailures = 0

  private val server = new ServerSocket(0)
  val port: Int = server.getLocalPort
  @volatile private var running = true

  private val thread = new Thread(() => {
    try while (running) {
      val sock = server.accept()
      synchronized { connections += 1 }
      // one thread per connection, like a real broker — a Spark
      // executor-side sink copy dials its own connection while the
      // driver's is still open (the per-partition connection model)
      val worker = new Thread(() => {
        try serve(sock)
        catch { case _: Exception => () }
        finally { try sock.close() catch { case _: Exception => () } }
      }, "loopback-amqp-conn")
      worker.setDaemon(true)
      worker.start()
    } catch { case _: Exception => () }
  }, "loopback-amqp-broker")
  thread.setDaemon(true)
  thread.start()

  def close(): Unit = {
    running = false
    try server.close() catch { case _: Exception => () }
  }

  // --- independent wire decoding ---
  private final class Reader(in: DataInputStream) {
    def frame(): (Int, Int, Array[Byte]) = {
      val t = in.readUnsignedByte()
      val ch = in.readUnsignedShort()
      val size = in.readInt()
      val p = new Array[Byte](size)
      in.readFully(p)
      require(in.readUnsignedByte() == 0xce,
        "client frame missing frame-end 0xCE")
      (t, ch, p)
    }
  }
  private final class Cursor(p: Array[Byte]) {
    var i = 0
    def u8(): Int = { val v = p(i) & 0xff; i += 1; v }
    def u16(): Int = (u8() << 8) | u8()
    def u32(): Long = (u16().toLong << 16) | u16().toLong
    def u64(): Long = (u32() << 32) | u32()
    def shortstr(): String = {
      val n = u8()
      val s = new String(p, i, n, UTF_8); i += n; s
    }
    def longstr(): Array[Byte] = {
      val n = u32().toInt
      val b = java.util.Arrays.copyOfRange(p, i, i + n); i += n; b
    }
  }

  private def sendMethod(out: DataOutputStream, channel: Int, classId: Int,
      methodId: Int)(args: ByteArrayOutputStream => Unit): Unit = {
    val b = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { b.write((v >> 8) & 0xff); b.write(v & 0xff) }
    w16(classId); w16(methodId)
    args(b)
    val p = b.toByteArray
    out.writeByte(1); out.writeShort(channel); out.writeInt(p.length)
    out.write(p); out.writeByte(0xce); out.flush()
  }
  private def sstr(b: ByteArrayOutputStream, s: String): Unit = {
    val x = s.getBytes(UTF_8); b.write(x.length); b.write(x, 0, x.length)
  }
  private def lstr(b: ByteArrayOutputStream, s: String): Unit = {
    val x = s.getBytes(UTF_8)
    b.write((x.length >> 24) & 0xff); b.write((x.length >> 16) & 0xff)
    b.write((x.length >> 8) & 0xff); b.write(x.length & 0xff)
    b.write(x, 0, x.length)
  }

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(
      new BufferedOutputStream(sock.getOutputStream))
    // protocol header: AMQP 0-9-1
    val hdr = new Array[Byte](8)
    in.readFully(hdr)
    require(new String(hdr, 0, 4, UTF_8) == "AMQP" &&
      hdr(5) == 0 && hdr(6) == 9 && hdr(7) == 1,
      s"bad protocol header: ${hdr.mkString(",")}")
    val rd = new Reader(in)
    sendMethod(out, 0, 10, 10) { b => // connection.start
      b.write(0); b.write(9) // version-major, version-minor
      b.write(Array[Byte](0, 0, 0, 0), 0, 4) // server-properties: empty
      lstr(b, "PLAIN"); lstr(b, "en_US")
    }
    // start-ok: client-properties table, mechanism, response, locale
    val (t1, _, p1) = rd.frame()
    require(t1 == 1, "expected method frame")
    val c1 = new Cursor(p1)
    require(c1.u16() == 10 && c1.u16() == 11, "expected connection.start-ok")
    val tableLen = c1.u32().toInt; c1.i += tableLen
    require(c1.shortstr() == "PLAIN", "mechanism must be PLAIN")
    val sasl = c1.longstr()
    val parts = new String(sasl, UTF_8).split("\u0000", -1)
    // NUL authzid NUL authcid NUL passwd -> ["", user, pass]
    if (parts.length != 3 || parts(1) != expectUser || parts(2) != expectPass) {
      synchronized { authFailures += 1 }
      sendMethod(out, 0, 10, 50) { b =>
        b.write(1); b.write(0x9e.toByte) // 403 ACCESS_REFUSED
        sstr(b, "ACCESS_REFUSED"); b.write(0); b.write(0); b.write(0); b.write(0)
      }
      return
    }
    sendMethod(out, 0, 10, 30) { b => // connection.tune
      b.write(0); b.write(0) // channel-max
      b.write(Array[Byte](0, 2, 0, 0), 0, 4) // frame-max 131072
      b.write(0); b.write(0) // heartbeat 0
    }
    val (_, _, p2) = rd.frame() // tune-ok
    val c2 = new Cursor(p2)
    require(c2.u16() == 10 && c2.u16() == 31, "expected connection.tune-ok")
    val (_, _, p3) = rd.frame() // connection.open
    val c3 = new Cursor(p3)
    require(c3.u16() == 10 && c3.u16() == 40, "expected connection.open")
    require(c3.shortstr() == "/", "vhost must be /")
    sendMethod(out, 0, 10, 41)(b => sstr(b, ""))
    val (_, ch4, p4) = rd.frame() // channel.open
    val c4 = new Cursor(p4)
    require(c4.u16() == 20 && c4.u16() == 10, "expected channel.open")
    sendMethod(out, ch4, 20, 11)(b => lstr(b, ""))

    // steady state: declare / publish(+header+body) / close
    var open = true
    var delivered = 0
    var pending: Option[(String, String, Int, Long)] = None // q, ctype, mode, size
    var pendingQueue = ""
    while (open) {
      val (ft, ch, p) = rd.frame()
      ft match {
        case 1 =>
          val c = new Cursor(p)
          val cid = c.u16(); val mid = c.u16()
          (cid, mid) match {
            case (50, 10) => // queue.declare
              c.u16() // ticket
              val q = c.shortstr()
              val bits = c.u8()
              this.synchronized { declares += Declared(q, (bits & 0x02) != 0) }
              sendMethod(out, ch, 50, 11) { b =>
                sstr(b, q)
                b.write(Array[Byte](0, 0, 0, 0), 0, 4) // message count
                b.write(Array[Byte](0, 0, 0, 0), 0, 4) // consumer count
              }
            case (60, 40) => // basic.publish
              c.u16() // ticket
              val ex = c.shortstr()
              require(ex == "", s"expected default exchange, got '$ex'")
              pendingQueue = c.shortstr()
            case (10, 50) => // connection.close
              sendMethod(out, 0, 10, 51)(_ => ())
              open = false
            case other =>
              sys.error(s"unexpected method $other")
          }
        case 2 => // content header
          val c = new Cursor(p)
          require(c.u16() == 60, "content header class must be 60 (basic)")
          c.u16() // weight
          val bodySize = c.u64()
          val flags = c.u16()
          require((flags & 0x8000) != 0, "content-type property must be set")
          require((flags & 0x1000) != 0, "delivery-mode property must be set")
          val ctype = c.shortstr()
          val mode = c.u8()
          pending = Some((pendingQueue, ctype, mode, bodySize))
        case 3 => // body
          val (q, ctype, mode, size) = pending.getOrElse(
            sys.error("body frame without a content header"))
          require(p.length.toLong == size, "body size must match the header")
          this.synchronized {
            messages += Delivered(q, new String(p, UTF_8), ctype, mode) }
          pending = None
          delivered += 1
          if (delivered >= dropAfterMessages) {
            sock.close() // abrupt TCP kill — no close dialogue
            open = false
          }
        case other => sys.error(s"unexpected frame type $other")
      }
    }
  }
}
