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
final class AuthEngine(val engine: Engine, credentials: Map[String, String]) {

  private val tokens = TrieMap.empty[String, String] // token -> user

  private val rng = new java.security.SecureRandom()

  /** Validate basic credentials, mint a bearer token
    * (`_handle_basic_auth` `flight_server.py:134-145`).
    */
  def authenticate(user: String, password: String): String = {
    if (!credentials.get(user).contains(password))
      throw new SecurityException("Invalid credentials")
    val bytes = new Array[Byte](32)
    rng.nextBytes(bytes)
    val token = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)
    tokens.put(token, user)
    token
  }

  /** Validate a bearer token (`_handle_token_auth`
    * `flight_server.py:147-151`).
    */
  private def check(token: String): Unit =
    if (!tokens.contains(token))
      throw new SecurityException("Invalid token")

  def revoke(token: String): Unit = tokens.remove(token)

  // gated capability surface
  def query(token: String, sql: String): DataFrame = { check(token); engine.query(sql) }
  def put(token: String, name: String, df: DataFrame): Unit = { check(token); engine.put(name, df) }
  def get(token: String, name: String): DataFrame = { check(token); engine.get(name) }
  def exchange(token: String, command: String, df: DataFrame): DataFrame = {
    check(token); engine.exchange(command, df)
  }
}
