package graft

import scala.collection.mutable
import org.apache.spark.sql.DataFrame

/** Registry for op-internal caches, so a LIBRARY caller can release them.
  *
  * Several operators cache an intermediate frame that their returned plan
  * references more than once (e.g. a tokenized corpus both aggregated and
  * exploded — without the cache, `Generate` re-evaluates the un-materialized
  * `transform()` once per output row). The cache must outlive the op call
  * (the plan hasn't run yet when the op returns), so the op cannot unpersist
  * it — but a long-lived session composing many queries would otherwise
  * accumulate them without bound. Ops route through [[cached]]; callers
  * release with [[releaseAll]] once the results are consumed. `graft.Bench`
  * and `graft.Verify` release after every query; a spec asserts the cache
  * manager ends empty.
  */
object OpCaches {
  private val frames = mutable.Buffer.empty[DataFrame]

  /** Cache `df` and register it for later release. */
  def cached(df: DataFrame): DataFrame = synchronized {
    frames += df
    df.cache()
  }

  /** Unpersist every registered frame (blocking, so the memory is really
    * back before the next measurement starts). */
  def releaseAll(): Unit = synchronized {
    frames.foreach(_.unpersist(blocking = true))
    frames.clear()
  }
}
