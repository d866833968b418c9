package graft.operators

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSuite

/** The session registry's concurrency and reclamation contract:
  * one build per key under concurrent first calls (no leaked temp dirs —
  * round-6 advice on TrieMap.getOrElseUpdate's double evaluation),
  * peek-without-build, and clear() reclaiming every artifact dir including
  * dirs whose build failed mid-flight. */
class SessionCachesSpec extends SparkSuite {

  test("dirMemo: concurrent first calls build exactly once and share one dir") {
    val builds = new AtomicInteger(0)
    val gate = new CountDownLatch(1)
    val key = "concurrent-" + System.nanoTime()
    val pool = Executors.newFixedThreadPool(8)
    try {
      val futures = (0 until 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = {
            gate.await()
            SessionCaches.dirMemo(spark, key) { dir =>
              builds.incrementAndGet()
              Thread.sleep(20) // widen the race window
              java.nio.file.Files.writeString(
                java.nio.file.Paths.get(dir, "x"), "built")
            }
          }
        })
      }
      gate.countDown()
      val dirs = futures.map(_.get(30, TimeUnit.SECONDS)).toSet
      assert(builds.get() == 1, s"build ran ${builds.get()} times for one key")
      assert(dirs.size == 1, s"callers saw different dirs: $dirs")
      assert(new java.io.File(dirs.head, "x").exists())
    } finally pool.shutdown()
  }

  test("dirMemo: second call serves without rebuilding; peekDir never builds") {
    val builds = new AtomicInteger(0)
    val key = "serve-" + System.nanoTime()
    assert(SessionCaches.peekDir(spark, "absent-" + key).isEmpty)
    assert(builds.get() == 0)
    val d1 = SessionCaches.dirMemo(spark, key)(_ => builds.incrementAndGet())
    val d2 = SessionCaches.dirMemo(spark, key)(_ => builds.incrementAndGet())
    assert(d1 == d2 && builds.get() == 1)
    assert(SessionCaches.peekDir(spark, key).contains(d1))
  }

  test("clear: reclaims built dirs AND dirs whose build threw") {
    val okKey = "ok-" + System.nanoTime()
    val badKey = "bad-" + System.nanoTime()
    val ok = SessionCaches.dirMemo(spark, okKey) { dir =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "x"), "y")
    }
    // a build that fails after creating its dir: the dir is registered
    // before build runs, so clear() can still reclaim it
    val bad = intercept[RuntimeException] {
      SessionCaches.dirMemo(spark, badKey)(_ => sys.error("build failed"))
    }
    assert(bad.getMessage.contains("build failed"))
    val leaked = SessionCaches.peekDir(spark, badKey)
    assert(leaked.isDefined, "failed build's dir must stay registered for clear()")
    SessionCaches.clear(spark)
    assert(!new java.io.File(ok).exists(), "clear must delete built artifact dirs")
    assert(!new java.io.File(leaked.get).exists(),
      "clear must delete the failed build's dir")
    assert(SessionCaches.size(spark) == 0)
  }
}
