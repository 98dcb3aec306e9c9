package graft.scale

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a map-side Catalyst expression — the
  * runtime-filter primitive Spark itself uses for row-level join
  * pruning, exposed for sketch-gated operators (bloom decontamination,
  * membership pre-filters ahead of a shuffle join).
  *
  * 100 TB shape: the filter is built ONCE from the small side
  * (`df.stat.bloomFilter`, a treeAggregate — executor-merged, driver
  * holds only the final bit array), ships as a literal in the plan the
  * way broadcast hints ship relations, and each corpus row pays one
  * hash-probe with NO shuffle and NO join. At 1% fpp the bit array is
  * ~1.2 bytes/item: a 100M-shingle reference set rides in ~120 MB where
  * an exact broadcast set of strings would be many GB — the regime
  * where the exact-broadcast decontamination path stops working.
  */
object Bloom {

  /** Build a Bloom filter over a LongType column (e.g. xxhash64 output).
    * `expectedItems` sizes the bit array for `fpp`.
    */
  def build(df: DataFrame, col: String, expectedItems: Long, fpp: Double): BloomFilter =
    df.stat.bloomFilter(col, math.max(expectedItems, 1L), fpp)

  /** `might_contain(serialized_bloom, value)` — evaluates map-side
    * against the deserialized-once sketch; `value` must be LongType
    * (the same contract as Spark's injected runtime bloom filters).
    */
  def mightContain(bf: BloomFilter, value: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    GraftColumnBridge.column(
      BloomFilterMightContain(Literal(bos.toByteArray),
        GraftColumnBridge.expression(value)))
  }
}
