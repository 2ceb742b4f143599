package graft.sources

import java.sql.{Connection, DriverManager}

/** Versioned, reversible schema migrations for the JDBC result store —
  * the Alembic lineage the reference manages its Postgres schema with
  * (alembic/versions/0001_initial_transaction_results.py:18-27 and the
  * two revisions chained onto it), where [[JdbcResults.ensureTable]] is
  * only create-if-absent: it can bootstrap an empty store but cannot
  * carry an existing POPULATED store from one schema version to the
  * next, or back.
  *
  * Model (Alembic's): a linear chain of revisions, each knowing the one
  * it revises; the store carries a single-row stamp table
  * (`graft_schema_version`) naming its current revision. `upgrade` walks
  * forward from the stamp to a target (default: head), `downgrade`
  * walks backward; every step runs in its own transaction WITH its
  * stamp update, so a mid-chain crash leaves a consistent
  * stamped-at-step-k store, never a half-applied step. Steps receive a
  * raw JDBC connection: DDL is engine dialect, not Spark's job — Spark
  * reads whatever schema the chain produced (the jdbc source infers it
  * per query, so readers never need recompiling for additive changes).
  */
object Migrations {

  /** One reversible revision. `revises` is None for the chain root. */
  final case class Migration(
      id: String,
      revises: Option[String],
      upgrade: Connection => Unit,
      downgrade: Connection => Unit)

  private val StampTable = "graft_schema_version"

  private def withConn[A](url: String)(f: Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  private def ensureStampTable(conn: Connection): Unit = {
    val rs = conn.getMetaData.getTables(null, null, StampTable.toUpperCase, null)
    val exists = rs.next(); rs.close()
    if (!exists) {
      val st = conn.createStatement()
      st.executeUpdate(
        s"CREATE TABLE $StampTable (revision VARCHAR(128) NOT NULL, " +
          "applied_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP)")
      st.close()
    }
  }

  /** The store's current revision (None = never migrated / at base). */
  def current(url: String): Option[String] = withConn(url) { conn =>
    ensureStampTable(conn)
    val st = conn.createStatement()
    val rs = st.executeQuery(s"SELECT revision FROM $StampTable")
    val rev = if (rs.next()) Option(rs.getString(1)) else None
    rs.close(); st.close()
    rev
  }

  private def setStamp(conn: Connection, rev: Option[String]): Unit = {
    val st = conn.createStatement()
    st.executeUpdate(s"DELETE FROM $StampTable")
    st.close()
    rev.foreach { r =>
      val ps = conn.prepareStatement(s"INSERT INTO $StampTable (revision) VALUES (?)")
      ps.setString(1, r); ps.executeUpdate(); ps.close()
    }
  }

  /** Validates linearity (Alembic refuses branched heads; so do we) and
    * returns the chain root-first. */
  private def ordered(chain: Seq[Migration]): Seq[Migration] = {
    require(chain.nonEmpty, "empty migration chain")
    require(chain.map(_.id).distinct.size == chain.size,
      s"duplicate revision ids in chain: ${chain.map(_.id).mkString(", ")}")
    val byRevises = chain.map(m => m.revises -> m).toMap
    require(byRevises.size == chain.size,
      "branched migration chain: two revisions revise the same parent")
    val root = byRevises.getOrElse(None,
      throw new IllegalArgumentException("migration chain has no root (revises = None)"))
    val out = Seq.newBuilder[Migration]
    var cur: Option[Migration] = Some(root)
    while (cur.isDefined) {
      out += cur.get
      cur = byRevises.get(Some(cur.get.id))
    }
    val o = out.result()
    require(o.size == chain.size,
      s"disconnected migration chain: reached ${o.size} of ${chain.size} revisions from the root")
    o
  }

  private def indexOfTarget(o: Seq[Migration], target: Option[String], op: String): Int =
    target match {
      case None => o.size - 1
      case Some(t) =>
        val i = o.indexWhere(_.id == t)
        require(i >= 0, s"$op target revision '$t' is not in the chain")
        i
    }

  /** Walk forward from the current stamp to `to` (default head).
    * Idempotent: already-applied revisions are skipped; re-running at
    * head is a no-op. Returns the revisions applied, in order. */
  def upgrade(url: String, chain: Seq[Migration], to: Option[String] = None): Seq[String] = {
    val o = ordered(chain)
    val target = indexOfTarget(o, to, "upgrade")
    val cur = current(url)
    val from = cur.map { c =>
      val i = o.indexWhere(_.id == c)
      require(i >= 0, s"store is at unknown revision '$c' — not in the provided chain")
      i
    }.getOrElse(-1)
    require(from <= target,
      s"store is at ${o(from).id}, PAST upgrade target ${o(target).id}; use downgrade")
    val applied = ((from + 1) to target).map { i =>
      withConn(url) { conn =>
        conn.setAutoCommit(false)
        ensureStampTable(conn)
        o(i).upgrade(conn)
        setStamp(conn, Some(o(i).id))
        conn.commit()
      }
      o(i).id
    }
    applied
  }

  /** Walk backward from the current stamp to `to` (None = all the way to
    * base, undoing the root too). Each step's `downgrade` runs with its
    * stamp move in one transaction. Returns the revisions undone. */
  def downgrade(url: String, chain: Seq[Migration], to: Option[String] = None): Seq[String] = {
    val o = ordered(chain)
    val target: Int = to match {
      case None => -1
      case some => indexOfTarget(o, some, "downgrade")
    }
    val cur = current(url).getOrElse(
      return Seq.empty) // at base: nothing to undo
    val from = o.indexWhere(_.id == cur)
    require(from >= 0, s"store is at unknown revision '$cur' — not in the provided chain")
    require(from >= target,
      s"store is at ${o(from).id}, BEFORE downgrade target ${o(target max 0).id}; use upgrade")
    val undone = (from until target by -1).map { i =>
      withConn(url) { conn =>
        conn.setAutoCommit(false)
        ensureStampTable(conn)
        o(i).downgrade(conn)
        setStamp(conn, if (i == 0) None else Some(o(i - 1).id))
        conn.commit()
      }
      o(i).id
    }
    undone
  }

  private def exec(conn: Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try st.executeUpdate(sql) finally st.close()
  }

  /** The engine's shipped chain for the scoring result store — the
    * reference's three-revision lineage re-expressed for the embedded
    * store ([[JdbcResults]] schema as the root; the reference's two
    * follow-on revisions carry empty bodies, so the follow-ons here
    * carry the changes a serving deployment actually accretes:
    * correlation-id capture and a status index). */
  def resultStoreChain(table: String = "transaction_results"): Seq[Migration] = Seq(
    Migration("g0001_initial_results", None,
      upgrade = exec(_,
        s"""CREATE TABLE $table (
           |  transaction_id VARCHAR(64) PRIMARY KEY,
           |  prediction_score DOUBLE,
           |  shap_values VARCHAR(4096),
           |  status VARCHAR(16))""".stripMargin),
      downgrade = exec(_, s"DROP TABLE $table")),
    Migration("g0002_correlation_id", Some("g0001_initial_results"),
      // additive, instant on a populated store; existing rows read NULL
      upgrade = exec(_, s"ALTER TABLE $table ADD COLUMN correlation_id VARCHAR(36)"),
      downgrade = exec(_, s"ALTER TABLE $table DROP COLUMN correlation_id")),
    Migration("g0003_status_index", Some("g0002_correlation_id"),
      upgrade = exec(_, s"CREATE INDEX ${table}_status_idx ON $table (status)"),
      downgrade = exec(_, s"DROP INDEX ${table}_status_idx")))
}
