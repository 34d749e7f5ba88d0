package graft.server

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the writer-priority lock (reference `RWLock.py:10-66`):
  * shared readers, exclusive writer, and — the property the JDK's
  * non-fair ReentrantReadWriteLock does not give — a waiting writer
  * blocks NEW readers. */
class WriterPriorityRWLockSpec extends AnyFunSuite {

  private def inThread(body: => Unit): Thread = {
    val t = new Thread(() => body)
    t.setDaemon(true)
    t.start()
    t
  }

  test("multiple readers hold the lock simultaneously") {
    val lock = new WriterPriorityRWLock
    val inside = new CountDownLatch(4)
    val release = new CountDownLatch(1)
    val ts = (1 to 4).map { _ =>
      inThread {
        lock.lockRead()
        try { inside.countDown(); release.await(5, TimeUnit.SECONDS) }
        finally lock.unlock()
      }
    }
    assert(inside.await(5, TimeUnit.SECONDS), "readers did not all enter")
    release.countDown()
    ts.foreach(_.join(5000))
  }

  test("writer excludes readers and other writers") {
    val lock = new WriterPriorityRWLock
    val active = new AtomicInteger(0)
    // violations recorded and asserted on the MAIN thread — an assert
    // inside a spawned thread would only kill that thread silently
    val writerSawCompany = new AtomicInteger(0)
    val ts = (1 to 8).map { i =>
      inThread {
        if (i % 2 == 0) lock.lockWrite() else lock.lockRead()
        try {
          val now = active.incrementAndGet()
          if (i % 2 == 0 && now != 1) writerSawCompany.incrementAndGet()
          Thread.sleep(5)
          // exit count also catches a reader overlapping a held writer
          if (i % 2 == 0 && active.get() != 1) writerSawCompany.incrementAndGet()
          active.decrementAndGet()
        } finally lock.unlock()
      }
    }
    ts.foreach(_.join(5000))
    assert(ts.forall(!_.isAlive), "some thread deadlocked")
    assert(writerSawCompany.get() == 0,
      s"writer shared the lock ${writerSawCompany.get()} times")
  }

  test("waiting writer blocks new readers (writer priority)") {
    val lock = new WriterPriorityRWLock
    val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val readerAIn = new CountDownLatch(1)
    val releaseA = new CountDownLatch(1)

    val a = inThread { // reader A holds the lock
      lock.lockRead()
      try { readerAIn.countDown(); releaseA.await(5, TimeUnit.SECONDS) }
      finally lock.unlock()
    }
    assert(readerAIn.await(5, TimeUnit.SECONDS))

    val w = inThread { // writer W queues behind A
      lock.lockWrite()
      try order.add("writer")
      finally lock.unlock()
    }
    // give W time to block inside lockWrite (writersWaiting = 1)
    Thread.sleep(100)

    val b = inThread { // reader B arrives while W waits → must queue after W
      lock.lockRead()
      try order.add("readerB")
      finally lock.unlock()
    }
    Thread.sleep(100)
    assert(order.isEmpty, "nobody should proceed while A holds the read lock")

    releaseA.countDown()
    Seq(a, w, b).foreach(_.join(5000))
    assert(order.toArray.toSeq == Seq("writer", "readerB"),
      s"writer must run before the late reader, got $order")
  }
}
