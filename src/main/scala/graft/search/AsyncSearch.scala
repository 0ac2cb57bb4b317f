package graft.search

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** `_async_search` — the long-query UX surface, Spark-shaped:
  *
  *  - `submit` starts the query on a background thread inside a Spark
  *    JOB GROUP named by the search id, pulling rows through
  *    `toLocalIterator` (one job per partition, so rows accumulate as
  *    partitions complete — REAL partial results, not a veneer).
  *  - `get` returns the ES response triple: (is_running,
  *    is_partial, rows-so-far).
  *  - `cancel` = `SparkContext.cancelJobGroup(id)` — in-flight stages
  *    die, the iterator thread unwinds, and the partial rows remain
  *    readable (ES keeps the partial response too).
  *  - `delete` drops the stored response.
  *
  * At 100 TB the registry holds per-search row buffers on the driver,
  * so `submit` callers bound the result with a LIMIT/top-k exactly as
  * ES bounds hits — the engine streams partitions, the driver stores
  * only the requested page.
  */
object AsyncSearch {

  final class Handle(
      val id: String,
      val rows: java.util.concurrent.ConcurrentLinkedQueue[Row],
      val running: AtomicBoolean,
      val cancelled: AtomicBoolean,
      @volatile var error: Option[String]) {
    // counted down AFTER the worker thread has set its job group, so
    // cancel() can't fire cancelJobGroup before the group exists (the
    // submit/cancel race: an early cancel would otherwise let the
    // already-running first partition job finish uncancelled)
    val groupSet = new java.util.concurrent.CountDownLatch(1)
  }

  private val registry = new ConcurrentHashMap[String, Handle]()

  /** Start `df` under job group `id`; returns immediately. */
  def submit(spark: SparkSession, id: String, df: DataFrame): Handle = {
    val h = new Handle(id, new java.util.concurrent.ConcurrentLinkedQueue[Row](),
      new AtomicBoolean(true), new AtomicBoolean(false), None)
    val prev = registry.putIfAbsent(id, h)
    require(prev == null, s"async search id already in flight: $id")
    val sc = spark.sparkContext
    val t = new Thread(() => {
      try {
        sc.setJobGroup(id, s"_async_search $id", interruptOnCancel = true)
        h.groupSet.countDown()
        // an early cancel (before the latch) is honored here, before
        // any job is submitted under the group
        if (!h.cancelled.get()) {
          val it = df.toLocalIterator()
          while (it.hasNext && !h.cancelled.get()) h.rows.add(it.next())
        }
      } catch {
        case e: Throwable =>
          // a cancelled job group surfaces as SparkException — that is
          // the expected cancel path, not an error
          if (!h.cancelled.get()) h.error = Some(String.valueOf(e.getMessage))
      } finally {
        h.groupSet.countDown()
        sc.clearJobGroup()
        h.running.set(false)
      }
    }, s"async-search-$id")
    t.setDaemon(true)
    t.start()
    h
  }

  /** ES `GET _async_search/<id>`: (is_running, is_partial, hits so
    * far). `is_partial` stays true while running or after a cancel. */
  def get(id: String): (Boolean, Boolean, Seq[Row]) = {
    val h = registry.get(id)
    require(h != null, s"unknown async search: $id")
    val running = h.running.get()
    val partial = running || h.cancelled.get() || h.error.isDefined
    (running, partial, h.rows.toArray(Array.empty[Row]).toSeq)
  }

  def error(id: String): Option[String] =
    Option(registry.get(id)).flatMap(_.error)

  /** ES `DELETE _async_search/<id>` while running = cancel: kills the
    * job group (running stages abort) and marks the response partial. */
  def cancel(spark: SparkSession, id: String): Unit = {
    val h = registry.get(id)
    require(h != null, s"unknown async search: $id")
    h.cancelled.set(true)
    // wait for the worker to have SET the group before cancelling it —
    // otherwise the cancel is a no-op and in-flight cluster work
    // survives (rows stop via the flag, but stages run to completion)
    h.groupSet.await(10, java.util.concurrent.TimeUnit.SECONDS)
    spark.sparkContext.cancelJobGroup(id)
  }

  /** Drop the stored response (the post-completion DELETE). */
  def delete(id: String): Unit = registry.remove(id)

  /** Wait until the search finishes or `timeoutMs` elapses; returns
    * whether it is still running (the `wait_for_completion_timeout`
    * submit parameter). */
  def await(id: String, timeoutMs: Long): Boolean = {
    val h = registry.get(id)
    require(h != null, s"unknown async search: $id")
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (h.running.get() && System.nanoTime() < deadline) Thread.sleep(10)
    h.running.get()
  }
}
