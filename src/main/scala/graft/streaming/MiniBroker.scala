package graft.streaming

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

/** A minimal append-only message broker over TCP, with the Kafka
  * consumption model: topics are ordered logs, producers append and get
  * back an offset, consumers fetch by (topic, fromOffset, max) and own
  * their position — at-least-once by construction, exactly the contract
  * [[StreamOps.kafkaQueueSource]] documents (reference
  * docker-compose.yml:98 runs Redis for the same role; this container
  * ships no broker OR connector jar, so the round-trip test the
  * reference's Celery integration gets for free needs a broker the repo
  * can start in-process — but over a REAL socket, so the wire path,
  * framing, and offset bookkeeping are actually exercised).
  *
  * Wire protocol (DataInput/DataOutput framing, one request per
  * round-trip, connection reusable):
  *  - PRODUCE (op 0): topic UTF, payload (len + bytes) → assigned offset
  *  - FETCH   (op 1): topic UTF, fromOffset long, max int →
  *                    count int, then count × (offset long, len + bytes)
  *  - END     (op 2): topic UTF → end offset long (next offset to be
  *                    assigned; 0 on an unknown topic — subscribing
  *                    before the first produce is not an error)
  *
  * Deliberately NOT distributed or durable (in-memory logs, single
  * node): it stands in for the broker a cluster deployment provides;
  * what the engine owns — the Spark source, decode, scoring, idempotent
  * upsert — is the part under test and identical either way.
  */
final class MiniBroker(port0: Int = 0) {

  private val topics = new ConcurrentHashMap[String, ArrayBuffer[Array[Byte]]]()
  private def log(topic: String): ArrayBuffer[Array[Byte]] =
    topics.computeIfAbsent(topic, _ => ArrayBuffer.empty)

  private val server = new ServerSocket()
  server.bind(new InetSocketAddress("127.0.0.1", port0))
  @volatile private var running = true

  def port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => serve(sock), s"mini-broker-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception if !running => () case _: Exception => () }
    }
  }, "mini-broker-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    try {
      while (running) {
        val op = in.read()
        if (op < 0) return // client closed
        val topic = in.readUTF()
        op match {
          case 0 => // PRODUCE
            val len = in.readInt()
            val payload = new Array[Byte](len)
            in.readFully(payload)
            val l = log(topic)
            val offset = l.synchronized { l += payload; l.size - 1L }
            out.writeLong(offset)
          case 1 => // FETCH
            val from = in.readLong()
            val max = in.readInt()
            val l = log(topic)
            val slice = l.synchronized {
              val until = math.min(l.size.toLong, from + max).toInt
              if (from >= until) Seq.empty
              else (from.toInt until until).map(i => (i.toLong, l(i)))
            }
            out.writeInt(slice.size)
            slice.foreach { case (off, bytes) =>
              out.writeLong(off)
              out.writeInt(bytes.length)
              out.write(bytes)
            }
          case 2 => // END
            val l = log(topic)
            out.writeLong(l.synchronized(l.size.toLong))
          case other =>
            throw new java.io.IOException(s"unknown broker op $other")
        }
        out.flush()
      }
    } catch { case _: Exception => () } finally sock.close()
  }

  def close(): Unit = {
    running = false
    server.close()
  }
}

/** Client side of the [[MiniBroker]] wire protocol — used by producers
  * (tests, ops tooling) and by the [[BrokerSource]] partition readers on
  * the executor side. One socket, sequential request/response. */
final class MiniBrokerClient(host: String, port: Int) extends AutoCloseable {
  private val sock = new Socket(host, port)
  sock.setTcpNoDelay(true)
  private val in = new DataInputStream(sock.getInputStream)
  private val out = new DataOutputStream(sock.getOutputStream)

  def produce(topic: String, payload: Array[Byte]): Long = synchronized {
    out.write(0); out.writeUTF(topic)
    out.writeInt(payload.length); out.write(payload); out.flush()
    in.readLong()
  }

  def fetch(topic: String, from: Long, max: Int): Seq[(Long, Array[Byte])] = synchronized {
    out.write(1); out.writeUTF(topic)
    out.writeLong(from); out.writeInt(max); out.flush()
    val n = in.readInt()
    (0 until n).map { _ =>
      val off = in.readLong()
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      (off, bytes)
    }
  }

  def endOffset(topic: String): Long = synchronized {
    out.write(2); out.writeUTF(topic); out.flush()
    in.readLong()
  }

  override def close(): Unit = sock.close()
}
