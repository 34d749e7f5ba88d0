package graft.server

import java.util.concurrent.locks.ReentrantLock

/** Writer-priority reader-writer lock — semantic parity with the
  * reference's hand-rolled RWLock (lifeomic/sparkflow `RWLock.py:10-66`):
  * several readers XOR one writer, and a *waiting* writer blocks new
  * readers so locked-mode gradient updates cannot be starved by a flood
  * of weight pulls. The JDK's `ReentrantReadWriteLock` makes no such
  * guarantee in non-fair mode (and fair mode is strict FIFO, not writer
  * priority), hence this 40-line monitor instead.
  *
  * State mirrors the reference: `rwlock > 0` = reader count, `-1` = one
  * active writer; `writersWaiting` gates new readers.
  */
final class WriterPriorityRWLock {
  private val monitor = new ReentrantLock()
  private val readersOk = monitor.newCondition()
  private val writersOk = monitor.newCondition()
  private var rwlock = 0
  private var writersWaiting = 0

  def lockRead(): Unit = {
    monitor.lock()
    try {
      while (rwlock < 0 || writersWaiting > 0) readersOk.await()
      rwlock += 1
    } finally monitor.unlock()
  }

  def lockWrite(): Unit = {
    monitor.lock()
    try {
      while (rwlock != 0) {
        writersWaiting += 1
        try writersOk.await() finally writersWaiting -= 1
      }
      rwlock = -1
    } finally monitor.unlock()
  }

  /** Releases either kind of hold, like the reference's single
    * `release()`: wakes one waiting writer first, readers only when no
    * writer is queued. */
  def unlock(): Unit = {
    monitor.lock()
    try {
      if (rwlock < 0) rwlock = 0 else rwlock -= 1
      if (writersWaiting > 0) { if (rwlock == 0) writersOk.signal() }
      else readersOk.signalAll()
    } finally monitor.unlock()
  }
}
