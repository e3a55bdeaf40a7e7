package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[Memo.once]] is what makes cross-query fixture sharing safe under
  * the bench's CONCURRENT warmup pool: exactly-once builds, callers
  * blocked until the build completes (never racing past a flag into a
  * half-written artifact), failures not cached.
  */
class MemoSpec extends AnyFunSuite {

  test("concurrent callers build exactly once and all see the value") {
    val cache = scala.collection.concurrent.TrieMap.empty[String, Int]
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 32).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          override def call(): Int = Memo.once(cache, "k", {
            builds.incrementAndGet()
            Thread.sleep(50) // widen the race window
            42
          })
        })
      }
      assert(futures.map(_.get()).toSet === Set(42))
      assert(builds.get() === 1)
    } finally pool.shutdown()
  }

  test("callers block until the build completes — no caller observes a miss") {
    val cache = scala.collection.concurrent.TrieMap.empty[String, String]
    val inBuild = new java.util.concurrent.CountDownLatch(1)
    val finish = new java.util.concurrent.CountDownLatch(1)
    val builder = new Thread(() => {
      Memo.once(cache, "slow", {
        inBuild.countDown()
        finish.await()
        "built"
      }): Unit
    })
    builder.start()
    inBuild.await()
    // second caller arrives mid-build; must get the FINISHED value
    val second = new java.util.concurrent.CompletableFuture[String]()
    val waiter = new Thread(() =>
      second.complete(Memo.once(cache, "slow", "wrong")): Unit)
    waiter.start()
    Thread.sleep(100)
    assert(!second.isDone, "mid-build caller must block, not build again")
    finish.countDown()
    assert(second.get(5, java.util.concurrent.TimeUnit.SECONDS) === "built")
    builder.join(); waiter.join()
  }

  test("a throwing build caches nothing; the next caller retries") {
    val cache = scala.collection.concurrent.TrieMap.empty[String, Int]
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    def build: Int = {
      if (attempts.incrementAndGet() == 1)
        throw new IllegalStateException("transient")
      7
    }
    intercept[IllegalStateException](Memo.once(cache, "k", build))
    assert(cache.get("k").isEmpty)
    assert(Memo.once(cache, "k", build) === 7)
    assert(attempts.get() === 2)
  }

  test("different keys never block each other (nested builds allowed)") {
    val cache = scala.collection.concurrent.TrieMap.empty[String, Int]
    // a build that itself memoizes another key — the ANN fixture chain
    val v = Memo.once(cache, "outer", 1 + Memo.once(cache, "inner", 10))
    assert(v === 11 && cache("inner") === 10)
  }
}
