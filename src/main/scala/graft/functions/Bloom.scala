package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import org.apache.spark.util.sketch.BloomFilter

/** Membership test against a broadcast Bloom filter, as a Column.
  *
  * The one sanctioned scalar UDF outside the Catalyst expressions: Spark's
  * `BloomFilterMightContain` expression is internal (it is what the
  * optimizer injects for runtime row-level filtering), so the public path
  * to an explicit, reusable bloom probe is a deserialized
  * `org.apache.spark.util.sketch.BloomFilter` behind a UDF. The filter
  * rides the broadcast, not the closure, so executors share one copy.
  *
  * May return false positives (bounded by the filter's fpp), never false
  * negatives — callers that need exact semantics follow the probe with an
  * exact join on the survivors, which is the classic two-phase shape: the
  * bloom kills ~99% of probe rows for free, the join only shuffles the
  * remainder.
  */
object Bloom {
  def mightContain(bf: Broadcast[BloomFilter])(c: Column): Column = {
    val probe = udf((s: String) => s != null && bf.value.mightContainString(s))
    probe(c)
  }
}
