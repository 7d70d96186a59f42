package graft.pipeline

import java.lang.ref.WeakReference
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

/** Registry for the spillable tokenized/quantized PROJECTIONS the near-dup
  * family persists (`MEMORY_AND_DISK`) so that one corpus scan feeds a
  * candidate leg plus its confirm legs (`Dedup.minhashNearDups` and kin,
  * `Similarity.cosineNearDups`, `Similarity.lshCosCandidates`).
  *
  * THE CACHING CONTRACT (ADVICE r14): these persists are intentionally NOT
  * unpersisted inside the operator — the returned DataFrame is lazy, and
  * its plan consumes the projection two-to-three times, so an eager
  * unpersist would re-run the dominant shingling/quantize cost per leg.
  * The blocks are reclaimed by Spark's ContextCleaner once the result
  * DataFrame (whose plan strongly references the cached relation) becomes
  * unreachable. A LONG-LIVED session invoking these operators repeatedly
  * without dropping its result references accumulates cached+spilled
  * blocks; such callers should either let results go out of scope between
  * invocations or call [[Projections.release]] after consuming a result —
  * releasing early is always SAFE (an evicted projection recomputes; it
  * never changes results), it only costs recompute if the same result is
  * re-consumed afterwards.
  */
object Projections {
  private val refs = new ConcurrentLinkedQueue[WeakReference[DataFrame]]()

  /** Persisted-projection registration — operators call this on each
    * projection right after `.persist(...)`. Weakly referenced: the
    * registry never delays ContextCleaner's normal reclamation. */
  private[graft] def register(df: DataFrame): DataFrame = {
    refs.add(new WeakReference(df))
    df
  }

  /** Unpersist (non-blocking) every still-live registered projection and
    * clear the registry; returns how many were released. The explicit
    * boundary for long-lived sessions — see the caching contract above. */
  def release(): Int = {
    var n = 0
    var ref = refs.poll()
    while (ref != null) {
      val df = ref.get()
      if (df != null) {
        df.unpersist(false)
        n += 1
      }
      ref = refs.poll()
    }
    n
  }
}
