package graft.streaming

import java.util.concurrent.ConcurrentHashMap

/** Read-your-writes field cache — the reference's
  * `core/search/LiveFieldValues.java` double-buffer protocol: writers
  * `add`/`delete` into the CURRENT map immediately after submitting the
  * document; when an index refresh STARTS, current rolls to OLD and a
  * fresh current begins (docs submitted during the refresh are not in
  * the reopening snapshot); when the refresh FINISHES, old is dropped —
  * the new reader now serves those ids. `get` checks current, then old,
  * then falls through to the (refreshed) index lookup, so a caller
  * always sees its own write no matter where the refresh cycle stands.
  *
  * Spark shape: a driver/serving-side cache in front of index lookups
  * (the index itself stays executor-distributed); the fallthrough is
  * whatever bounded lookup the caller wires — typically a docmeta
  * point-read with a pushed key predicate.
  */
final class LiveFieldValues[T](lookup: String => Option[T]) {
  private val Deleted: AnyRef = new Object
  @volatile private var current = new ConcurrentHashMap[String, AnyRef]()
  @volatile private var old = new ConcurrentHashMap[String, AnyRef]()

  /** Record the value just submitted for `id` (IndexWriter add/update). */
  def add(id: String, value: T): Unit =
    current.put(id, value.asInstanceOf[AnyRef])

  /** Record a just-submitted delete of `id`. */
  def delete(id: String): Unit = current.put(id, Deleted)

  /** Refresh started: the reopening snapshot contains everything
    * submitted BEFORE this point, nothing after.
    */
  def beforeRefresh(): Unit = {
    old = current
    current = new ConcurrentHashMap[String, AnyRef]()
  }

  /** Refresh finished: the new reader serves what was in old. */
  def afterRefresh(): Unit =
    old = new ConcurrentHashMap[String, AnyRef]()

  /** Current value of `id`: pending write, else pending-at-refresh
    * write, else the index. A pending delete masks the index.
    */
  def get(id: String): Option[T] = {
    val c = current.get(id)
    if (c != null) return if (c eq Deleted) None else Some(c.asInstanceOf[T])
    val o = old.get(id)
    if (o != null) return if (o eq Deleted) None else Some(o.asInstanceOf[T])
    lookup(id)
  }

  /** Pending (unrefreshed) entry count, both buffers. */
  def pending: Int = current.size + old.size
}
