package graft.ingest

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Contract proofs for the S5/S6 cursor backends: precedence, read-after-
  * commit visibility, torn-write safety, and deliberate failure on
  * malformed configuration (the remote-KV pair the reference keeps in
  * S3/DynamoDB is proven against the in-memory client — same surface). */
class CursorStoreSpec extends AnyFunSuite {

  private def tmpDir(): String =
    Files.createTempDirectory("cursor").toString

  test("file store: read-after-commit, atomic replace") {
    val st = new FileCursorStore(tmpDir())
    assert(st.read().isEmpty)
    st.commit(42L)
    assert(st.read().contains(42L))
    st.commit(43L)
    assert(st.read().contains(43L))
  }

  test("file store: a corrupt cursor file fails naming the file, not bare NFE") {
    val dir = tmpDir()
    Files.write(java.nio.file.Paths.get(dir, "last_repo_id.txt"),
      "garbage".getBytes("UTF-8"))
    val ex = intercept[IllegalStateException] {
      new FileCursorStore(dir).read()
    }
    assert(ex.getMessage.contains("last_repo_id.txt"))
    assert(ex.getMessage.contains("garbage"))
  }

  test("env store: blank is unset, numeric seeds, junk fails naming the var") {
    def env(m: Map[String, String]): String => Option[String] = m.get
    assert(new EnvCursorStore("V", env(Map.empty)).read().isEmpty)
    assert(new EnvCursorStore("V", env(Map("V" -> "  "))).read().isEmpty)
    assert(new EnvCursorStore("V", env(Map("V" -> " 17 "))).read().contains(17L))
    val ex = intercept[IllegalArgumentException] {
      new EnvCursorStore("V", env(Map("V" -> "not-a-number"))).read()
    }
    assert(ex.getMessage.contains("V"))
    assert(ex.getMessage.contains("not-a-number"))
    intercept[UnsupportedOperationException] {
      new EnvCursorStore("V", env(Map.empty)).commit(1L)
    }
  }

  test("KV store: read-after-commit against the in-memory client") {
    val kv = new InMemoryKVClient
    val st = new KVCursorStore(kv)
    assert(st.read().isEmpty)
    st.commit(100L)
    assert(st.read().contains(100L)) // visible to the next read
    st.commit(200L)
    assert(st.read().contains(200L))
  }

  test("KV store: a crashing put leaves the previous value intact") {
    // torn-write safety: the client contract is atomic whole-value put —
    // a put that throws must not alter the stored value
    val kv = new KVClient {
      private val inner = new InMemoryKVClient
      var failNext = false
      override def get(key: String): Option[String] = inner.get(key)
      override def put(key: String, value: String): Unit = {
        if (failNext) { failNext = false; throw new RuntimeException("io") }
        inner.put(key, value)
      }
    }
    val st = new KVCursorStore(kv)
    st.commit(7L)
    kv.failNext = true
    intercept[RuntimeException] { st.commit(8L) }
    assert(st.read().contains(7L)) // old cursor survives the failed commit
  }

  test("chain: first backend with a value wins; commits go to the head") {
    val kv = new InMemoryKVClient
    val primary = new KVCursorStore(kv)
    val seed = new EnvCursorStore("V", Map("V" -> "5").get)
    val chain = new ChainedCursorStore(Seq(primary, seed))
    assert(chain.read().contains(5L)) // fresh deploy: env seed wins
    chain.commit(9L)
    assert(chain.read().contains(9L))  // committed primary now beats seed
    assert(primary.read().contains(9L))
  }

  test("runner precedence matrix: injected KV chain beats file/env default") {
    // file/env precedence is covered by IncrementalRunnerSpec; here the
    // injected remote-KV chain replaces it wholesale
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    val kv = new InMemoryKVClient
    kv.put("last_repo_id", "33")
    val runner = new IncrementalRunner(spark,
      new DataFrameRepoSource(spark.emptyDataFrame), tmpDir(),
      env = _ => Some("999"), // env would say 999 --
      store = Some(new ChainedCursorStore(Seq(new KVCursorStore(kv)))))
    assert(runner.cursor == 33L) // -- but the injected KV chain wins
  }
}
