package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.util.Try

/** Cursor persistence contract — the S5 (read) / S6 (commit) pair behind
  * the reference's file, env-var, S3 and DynamoDB backends (reference
  * src/extract_github_data.py:164-235). Invariants every backend must
  * hold, proven by CursorStoreSpec:
  *
  *   - **read-after-commit**: a successful `commit(id)` is visible to the
  *     next `read()` from the same store;
  *   - **torn-write safety**: a crash mid-commit leaves either the old
  *     value or the new one, never a partial/corrupt cursor;
  *   - `read()` is None when the backend holds no cursor (fresh deploy).
  */
trait CursorStore {
  def read(): Option[Long]
  def commit(id: Long): Unit
}

object CursorStore {
  /** The runner's default precedence (reference get_last_repo_id): the
    * file backend first — it is what commits advance — then the env-var
    * seed for fresh deployments. Remote KV backends chain in ahead of the
    * env seed the same way. */
  def default(stateDir: String, env: String => Option[String]): CursorStore =
    new ChainedCursorStore(Seq(
      new FileCursorStore(stateDir),
      new EnvCursorStore(IncrementalRunner.CursorEnvVar, env)))
}

/** Precedence chain: first backend with a value wins on read; commits go
  * to the PRIMARY (head) backend only — seeds never advance. */
final class ChainedCursorStore(stores: Seq[CursorStore]) extends CursorStore {
  require(stores.nonEmpty, "cursor chain needs at least one backend")
  override def read(): Option[Long] = stores.view.flatMap(_.read()).headOption
  override def commit(id: Long): Unit = stores.head.commit(id)
}

/** File backend (reference :184-188): atomic temp-write + move, so a
  * crash never leaves a torn cursor on disk. */
final class FileCursorStore(stateDir: String) extends CursorStore {
  private val cursorFile = Paths.get(stateDir, "last_repo_id.txt")

  override def read(): Option[Long] =
    if (Files.exists(cursorFile)) {
      val v = new String(Files.readAllBytes(cursorFile),
        StandardCharsets.UTF_8).trim
      Some(Try(v.toLong).getOrElse(throw new IllegalStateException(
        s"cursor file $cursorFile holds a non-numeric value: '$v'")))
    } else None

  override def commit(id: Long): Unit = {
    Files.createDirectories(cursorFile.getParent)
    val tmp = cursorFile.resolveSibling("last_repo_id.tmp")
    Files.write(tmp, id.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, cursorFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

/** Env-var backend (reference LAST_REPO_ID fallback, :190-194): a
  * read-only seed. A blank variable counts as unset; a non-numeric value
  * is a configuration error and fails naming the variable rather than
  * surfacing a bare NumberFormatException from deep inside the runner. */
final class EnvCursorStore(name: String, env: String => Option[String])
    extends CursorStore {
  override def read(): Option[Long] =
    env(name).map(_.trim).filter(_.nonEmpty).map { v =>
      Try(v.toLong).getOrElse(throw new IllegalArgumentException(
        s"env var $name must be a repo id (long), got: '$v'"))
    }
  override def commit(id: Long): Unit =
    throw new UnsupportedOperationException(
      s"env backend $name is a read-only seed")
}

/** Remote-KV client contract — the S3-object / DynamoDB-item surface the
  * reference's remote backends use (reference :196-231): whole-value get
  * and ATOMIC whole-value put of one key. Offline here, so the shipped
  * implementation is in-memory; an S3/DynamoDB client implements the same
  * two methods. */
trait KVClient extends Serializable {
  def get(key: String): Option[String]
  def put(key: String, value: String): Unit
}

final class InMemoryKVClient extends KVClient {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, String]()
  override def get(key: String): Option[String] = Option(m.get(key))
  override def put(key: String, value: String): Unit = { m.put(key, value); () }
}

/** KV backend: the cursor is one key whose value is the id in decimal.
  * Torn-write safety is inherited from the client's atomic-put contract —
  * a put that throws must leave the previous value intact (S3 PUT and
  * DynamoDB PutItem both behave this way), which CursorStoreSpec proves
  * against a crash-injecting client. */
final class KVCursorStore(kv: KVClient, key: String = "last_repo_id")
    extends CursorStore {
  override def read(): Option[Long] = kv.get(key).map { v =>
    Try(v.trim.toLong).getOrElse(throw new IllegalStateException(
      s"KV cursor '$key' holds a non-numeric value: '$v'"))
  }
  override def commit(id: Long): Unit = kv.put(key, id.toString)
}
