package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

/** Pins [[Jobs.par]]'s contract: all thunks run, the first failure
  * rethrows unwrapped after every thunk settles, and — the §2.6 hygiene
  * case — an interrupt of the CALLER cancels the remaining thunks instead
  * of leaving them running against the verb's staging dir. */
class JobsSpec extends AnyFunSuite {

  test("par runs every thunk and returns after all complete") {
    val n = new AtomicInteger(0)
    Jobs.par(Seq.fill(4)(() => { n.incrementAndGet(); () }): _*)
    assert(n.get() == 4)
  }

  test("par rethrows the first failure unwrapped after all thunks settle") {
    val ran = new AtomicInteger(0)
    val e = intercept[IllegalStateException] {
      Jobs.par(
        () => { ran.incrementAndGet(); throw new IllegalStateException("boom") },
        () => { Thread.sleep(50); ran.incrementAndGet(); () })
    }
    assert(e.getMessage == "boom")
    assert(ran.get() == 2, "the non-failing thunk must still settle")
  }

  test("interrupting the caller cancels pending thunks and rethrows") {
    val firstStarted = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val secondSawInterrupt = new AtomicBoolean(false)
    val secondFinishedNormally = new AtomicBoolean(false)
    val callerThrew = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val caller = new Thread(() =>
      try Jobs.par(
        () => { // thunk 1: blocks until released (never, in this test)
          firstStarted.countDown()
          try release.await(10, TimeUnit.SECONDS)
          catch { case _: InterruptedException => () }
          ()
        },
        () => { // thunk 2: long sleep — must be cancelled, not left running
          try { Thread.sleep(10000); secondFinishedNormally.set(true) }
          catch { case _: InterruptedException => secondSawInterrupt.set(true) }
          ()
        })
      catch { case t: Throwable => callerThrew.set(t) })
    caller.start()
    assert(firstStarted.await(5, TimeUnit.SECONDS), "thunk 1 never started")
    Thread.sleep(100) // let the caller block in f.get() on thunk 1
    caller.interrupt()
    caller.join(5000)
    assert(!caller.isAlive, "par did not return after the caller interrupt")
    assert(callerThrew.get().isInstanceOf[InterruptedException],
      s"expected InterruptedException, got ${callerThrew.get()}")
    // the cancelled sleeper must have been interrupted, not run to term
    val deadline = System.nanoTime() + 5e9.toLong
    while (!secondSawInterrupt.get() && !secondFinishedNormally.get() &&
      System.nanoTime() < deadline) Thread.sleep(10)
    assert(secondSawInterrupt.get(), "pending thunk was not cancelled")
    assert(!secondFinishedNormally.get())
  }
}
