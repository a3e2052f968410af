package graft.engine

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{InetAddress, ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

import org.apache.spark.sql.DataFrame

/** Minimal network transport facade over an [[Engine]] — the analog of
  * Mallard's Flight server *listening on a port*
  * (`flight_server.py:271-284`, `serve()` loop `:433-487`), rebuilt
  * with zero dependencies because no Arrow Flight / gRPC jars exist in
  * this offline environment.
  *
  * Protocol (newline-delimited, UTF-8):
  *  - client sends ONE statement per line;
  *  - `REGISTER <name> AS <sql>` registers a SQL-defined exchanger in
  *    the engine registry (the SQL sees the exchange input as
  *    `__input__`) — the wire version of the reference's runtime code
  *    shipping (`flight_server.py:402-427`);
  *  - `EXCHANGE <name> FROM <table>` applies a registered exchanger to
  *    a catalog table and streams the result back;
  *  - anything else routes through `Engine.query` (SQL, DML, DDL);
  *  - server replies with one JSON object per result row (Spark's
  *    canonical `toJSON` encoding), then one `##end` terminator line;
  *  - on failure it replies `##error <message>` then `##end` — the
  *    connection survives, matching the reference server's
  *    error-as-response behavior (`flight_server.py:312-315`).
  *
  * Security: binds the loopback address by default — an unauthenticated
  * wildcard bind would expose DROP/DELETE to any host that can reach
  * the port. Passing an [[AuthEngine]] requires a handshake as the
  * FIRST line of every connection (the reference gates connections the
  * same way, basic→bearer middleware `flight_server.py:110-161`):
  *  - `##auth <user> <password>` validates credentials and replies
  *    `##ok <token>` (the token works on other connections too);
  *  - `##token <token>` presents an existing bearer token, `##ok`;
  *  - anything else (or invalid credentials) → `##error …` and the
  *    connection closes.
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
final class TcpGate(val engine: Engine, port: Int = 0,
    auth: Option[AuthEngine] = None,
    bindAddress: InetAddress = InetAddress.getLoopbackAddress)
  extends AutoCloseable {

  private val server = new ServerSocket(port, 50, bindAddress)
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
          // raced with close(): it may have swept `clients` before the
          // add above — close the straggler ourselves
          if (!running) { clients.remove(sock); sock.close() }
          else pool.submit(new Runnable { def run(): Unit = serve(sock) })
        } catch {
          case _: SocketException => () // closed during accept — shutdown
        }
  })

  private val RegisterRe =
    "(?is)^REGISTER\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+AS\\s+(.+)$".r
  private val ExchangeRe =
    "(?is)^EXCHANGE\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+FROM\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*$".r

  private def runLine(line: String): DataFrame = line match {
    case RegisterRe(name, sqlText) =>
      engine.registerSqlExchanger(name, sqlText); engine.statusOk
    case ExchangeRe(name, table) =>
      engine.exchange(name, engine.get(table))
    case sql => engine.query(sql)
  }

  private val AuthRe = "(?s)^##auth\\s+(\\S+)\\s+(.+)$".r
  private val TokenRe = "(?s)^##token\\s+(\\S+)\\s*$".r

  /** Returns true when the connection may proceed. Writes its own
    * protocol lines either way.
    */
  private def handshake(a: AuthEngine, in: BufferedReader, out: PrintWriter): Boolean = {
    val ok = try {
      in.readLine() match {
        case AuthRe(user, password) => Some(a.authenticate(user, password))
        case TokenRe(token)         => a.validate(token); Some(token)
        case _                      => None
      }
    } catch { case _: SecurityException => None }
    ok match {
      case Some(token) =>
        out.println(s"##ok $token"); out.println("##end"); out.flush(); true
      case None =>
        out.println("##error authentication required")
        out.println("##end"); out.flush(); false
    }
  }

  private def serve(sock: Socket): Unit = {
    val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    val out = new PrintWriter(
      new java.io.OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8), false)
    try {
      if (auth.forall(a => handshake(a, in, out))) {
        var line = in.readLine()
        while (line != null && running) {
          if (line.trim.nonEmpty) {
            try {
              val it = runLine(line).toJSON.toLocalIterator()
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
    // second sweep: a connection accepted concurrently with the first
    // sweep may have been added after it ran (the accept loop also
    // self-closes on the same race — belt and braces)
    clients.forEach(s => try s.close() catch { case _: Exception => () })
    ()
  }
}
