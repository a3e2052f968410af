package graft.engine

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

/** Minimal network transport facade over an [[Engine]] — the analog of
  * Mallard's Flight server *listening on a port*
  * (`flight_server.py:271-284`, `serve()` loop `:433-487`), rebuilt
  * with zero dependencies because no Arrow Flight / gRPC jars exist in
  * this offline environment.
  *
  * Protocol (newline-delimited, UTF-8):
  *  - client sends ONE SQL statement per line;
  *  - server replies with one JSON object per result row (Spark's
  *    canonical `toJSON` encoding), then one `##end` terminator line;
  *  - on failure it replies `##error <message>` then `##end` — the
  *    connection survives, matching the reference server's
  *    error-as-response behavior (`flight_server.py:312-315`).
  *
  * Result rows stream through `toLocalIterator` — one partition in
  * driver memory at a time, never the whole result. A single socket is
  * inherently a driver-side funnel; that is exactly the reference's
  * transport model (every Mallard GET funnels through one gRPC
  * stream), so this facade is capability parity, not the recommended
  * data path. The engine's real data plane remains the cluster
  * (`Engine.transferTable` moves plans, not bytes). Scale guidance:
  * use the gate for control-plane SQL (DDL, DML verbs, small results)
  * and sinks (`sink_*` keys) for bulk egress.
  */
final class TcpGate(val engine: Engine, port: Int = 0) extends AutoCloseable {

  private val server = new ServerSocket(port)
  private val pool = Executors.newCachedThreadPool()
  @volatile private var running = true

  /** Live client sockets — socket reads are not interruptible, so
    * close() must close these directly to unblock their readLine and
    * let the (non-daemon) pool threads exit.
    */
  private val clients =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Socket]()

  /** The actual bound port (pass 0 to let the OS pick). */
  def boundPort: Int = server.getLocalPort

  pool.submit(new Runnable {
    def run(): Unit =
      while (running)
        try {
          val sock = server.accept()
          clients.add(sock)
          pool.submit(new Runnable { def run(): Unit = serve(sock) })
        } catch {
          case _: SocketException => () // closed during accept — shutdown
        }
  })

  private def serve(sock: Socket): Unit = {
    val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    val out = new PrintWriter(
      new java.io.OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8), false)
    try {
      var line = in.readLine()
      while (line != null && running) {
        if (line.trim.nonEmpty) {
          try {
            val it = engine.query(line).toJSON.toLocalIterator()
            while (it.hasNext) out.println(it.next())
          } catch {
            case e: Exception =>
              out.println(s"##error ${Option(e.getMessage).getOrElse(e.toString).replaceAll("\\R", " ")}")
          }
          out.println("##end")
          out.flush()
        }
        line = in.readLine()
      }
    } catch {
      case _: SocketException => () // client went away or gate closed
    } finally {
      clients.remove(sock)
      sock.close()
    }
  }

  override def close(): Unit = {
    running = false
    server.close()
    // unblock every serve thread parked in readLine — interrupt alone
    // cannot (socket I/O ignores it)
    clients.forEach(s => try s.close() catch { case _: Exception => () })
    pool.shutdownNow()
    ()
  }
}
