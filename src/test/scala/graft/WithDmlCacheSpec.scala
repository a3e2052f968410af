package graft

import graft.engine.{Engine, GateClient, TcpGate}

/** VERDICT r10 #1: keyword sniffing classified `WITH t AS (…) INSERT
  * INTO …` as a pure, cacheable read — the one known way the engine
  * could return a WRONG answer (stale cached bytes after a mutation,
  * and a cached DML replay that skips the write). Classification now
  * parses the statement (`Engine.classify`); these specs pin both the
  * classifier and the end-to-end gate behavior.
  */
class WithDmlCacheSpec extends SparkSpec {

  private def fresh() = new Engine(spark.newSession())

  test("parsed-plan purity: WITH-prefixed DML is impure and non-cacheable") {
    val e = fresh()
    // plain queries: pure AND cache-admissible
    assert(e.isPureQuery("SELECT 1"))
    assert(e.isCacheableQuery("SELECT 1"))
    assert(e.isPureQuery("WITH t AS (SELECT 1 AS x) SELECT * FROM t"))
    assert(e.isCacheableQuery("WITH t AS (SELECT 1 AS x) SELECT * FROM t"))
    assert(e.isCacheableQuery("VALUES (1, 'a')"))
    // the hole: CTE-wrapped DML parses to InsertIntoStatement under the CTE
    val withInsert = "WITH t AS (SELECT 1 AS x) INSERT INTO tgt SELECT * FROM t"
    assert(!e.isPureQuery(withInsert))
    assert(!e.isCacheableQuery(withInsert))
    // read-only commands: pure (no epoch bump) but never cache-installed
    assert(e.isPureQuery("SHOW TABLES"))
    assert(!e.isCacheableQuery("SHOW TABLES"))
    assert(e.isPureQuery("EXPLAIN SELECT 1"))
    assert(e.isPureQuery("DESCRIBE nation"))
    // other mutating shapes reachable through bare spark.sql
    assert(!e.isPureQuery("SET spark.sql.ansi.enabled=true"))
    assert(!e.isPureQuery("CACHE TABLE t"))
    assert(!e.isPureQuery("INSERT INTO t VALUES (1)"))
    assert(!e.isPureQuery("CREATE TABLE t (x INT) USING parquet"))
    // unparseable text errs non-pure (sound: cold cache, never stale)
    assert(!e.isPureQuery("definitely not sql"))
    assert(!e.isCacheableQuery("definitely not sql"))
  }

  test("WITH…INSERT through the gate executes every time; GETs serve fresh bytes") {
    val e = fresh()
    val gate = new TcpGate(e)
    val tbl = s"graft_wdml_${(System.nanoTime() % 1000000).toString}"
    try {
      val c = new GateClient("127.0.0.1", gate.boundPort)
      try {
        c.format("arrow")
        def run(stmt: String): Long = c.sqlArrowRowCount(stmt)
        val get = s"SELECT x FROM $tbl ORDER BY x"

        run(s"CREATE TABLE $tbl (x INT) USING parquet")
        run(s"INSERT INTO $tbl VALUES (1)")
        assert(run(get) == 1L)
        assert(run(get) == 1L) // second GET: cache hit under current stamp
        assert(gate.cacheStats._1 == 1)

        // CTE-wrapped DML, twice. Pre-fix this statement (a) was itself
        // cached — the second send would replay bytes without writing —
        // and (b) bumped no epoch, so the GET below served 1 stale row.
        val withInsert =
          s"WITH add AS (SELECT 2 AS x UNION ALL SELECT 3 AS x) " +
            s"INSERT INTO $tbl SELECT max(x) AS x FROM add"
        run(withInsert)
        run(withInsert)
        assert(run(get) == 3L, "both WITH…INSERTs must have executed")
        assert(run(get) == 3L)
      } finally c.close()
    } finally {
      gate.close()
      e.spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }
}
