package graft.engine

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.DataFrame

/** Basic→Bearer auth gate over an Engine (reference A16,
  * `AuthMiddlewareFactory` `flight_server.py:110-161`): user/password
  * validates once and mints an opaque bearer token; every subsequent
  * call presents the token. Tokens are per-engine, like the reference's
  * per-server middleware — a token minted by one server is meaningless
  * to another.
  *
  * This is an API facade, not a data operator (SURVEY §2A marks A16 out
  * of engine scope): it gates driver-side entry points; executors never
  * see credentials.
  */
final class AuthEngine(val engine: Engine, credentials: Map[String, String],
    tokenTtlMillis: Long = 60 * 60 * 1000L) {

  private def sha256(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))

  // plaintext passwords are hashed once at construction (salted with
  // the user name so equal passwords get distinct digests) and never
  // retained; comparisons go through MessageDigest.isEqual, which is
  // constant-time (a plain String == leaks a timing side channel)
  private def saltedHash(user: String, password: String): Array[Byte] =
    sha256(s"$user:$password")

  private val hashed: Map[String, Array[Byte]] =
    credentials.map { case (u, p) => u -> saltedHash(u, p) }

  private val tokens = TrieMap.empty[String, (String, Long)] // token -> (user, expiresAt)

  private val rng = new java.security.SecureRandom()

  /** Validate basic credentials, mint a bearer token
    * (`_handle_basic_auth` `flight_server.py:134-145`). Tokens expire
    * after `tokenTtlMillis`, so the map cannot grow unboundedly even
    * if `revoke` is never called.
    */
  def authenticate(user: String, password: String): String = {
    // hash BEFORE the user lookup: an unknown user must cost the same
    // as a wrong password, or response time enumerates valid users
    val given = saltedHash(user, password)
    val ok = hashed.get(user)
      .exists(h => java.security.MessageDigest.isEqual(h, given))
    if (!ok) throw new SecurityException("Invalid credentials")
    val bytes = new Array[Byte](32)
    rng.nextBytes(bytes)
    val token = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)
    tokens.put(token, (user, System.currentTimeMillis() + tokenTtlMillis))
    // opportunistic sweep: drop every expired token while we hold one
    val now = System.currentTimeMillis()
    tokens.filterInPlace { case (_, (_, exp)) => exp > now }
    token
  }

  /** Validate a bearer token (`_handle_token_auth`
    * `flight_server.py:147-151`).
    */
  private def check(token: String): Unit = tokens.get(token) match {
    case Some((_, exp)) if exp > System.currentTimeMillis() => ()
    case Some(_) => tokens.remove(token)
      throw new SecurityException("Token expired")
    case None => throw new SecurityException("Invalid token")
  }

  def revoke(token: String): Unit = tokens.remove(token)

  /** Connection-scoped validation (the TcpGate handshake): throws on
    * an invalid/expired token, like the reference's per-call middleware
    * header check (`flight_server.py:147-151`).
    */
  def validate(token: String): Unit = check(token)

  // gated capability surface
  def query(token: String, sql: String): DataFrame = { check(token); engine.query(sql) }
  def put(token: String, name: String, df: DataFrame): Unit = { check(token); engine.put(name, df) }
  def get(token: String, name: String): DataFrame = { check(token); engine.get(name) }
  def exchange(token: String, command: String, df: DataFrame): DataFrame = {
    check(token); engine.exchange(command, df)
  }
}
