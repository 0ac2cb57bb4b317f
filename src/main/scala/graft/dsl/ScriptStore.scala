package graft.dsl

/** `_scripts/{id}` — the cluster-state stored-script registry.
  *
  * ES stores Painless scripts and mustache search templates under the
  * same endpoint; queries then reference them by `{"id": ...}` instead
  * of inlining `{"source": ...}`. Here the registry is driver-side
  * state (the compiled form is what ships to executors either way —
  * a stored script changes WHICH expression compiles, not how it
  * runs), so lookups cost nothing at scan time.
  */
object ScriptStore {
  private val store = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def put(id: String, source: String): Unit = store.put(id, source)
  def get(id: String): Option[String] = Option(store.get(id))
  def delete(id: String): Unit = store.remove(id)

  def resolve(id: String): String = get(id).getOrElse(
    throw new IllegalArgumentException(s"no stored script: $id"))
}
