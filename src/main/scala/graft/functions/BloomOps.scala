package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership as a native, codegen-friendly predicate —
  * the scale pattern for "filter a huge table against a large key set"
  * when the key set outgrows a plain broadcast-hash join but its
  * FIXED-SIZE Bloom filter still fits comfortably on every executor
  * (size is set by `expectedItems`/`fpp`, independent of data volume:
  * 10M keys at 1% fpp ≈ 12 MB of bits, whatever the keys weigh).
  *
  * Build and probe both go through `xxhash64`, matching the hashing
  * contract of Spark's own runtime row-level filtering
  * (`BloomFilterAggregate` / `BloomFilterMightContain` pairs inserted
  * by `InjectRuntimeFilter`): the filter stores the 64-bit hash of the
  * key, and the probe tests the same hash. The probe column compiles
  * to the built-in [[BloomFilterMightContain]] Catalyst predicate with
  * the serialized filter as a foldable binary literal — evaluated
  * inside the scan's codegen span, no UDF, no broadcast variable
  * plumbing (the literal ships with the task binary once).
  *
  * Probes can return false positives (rate ≈ `fpp`) but never false
  * negatives, so the intended use is as a PREFILTER in front of an
  * exact join: the exact join then shuffles only the surviving
  * fraction. See `Selection.bloomDecontaminate`.
  */
object BloomOps {

  /** Build a Bloom filter over `xxhash64(key)` distributed (executors
    * aggregate partial filters; the driver receives only the merged
    * fixed-size bit array) and return its serialized form. */
  def buildBloom(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val bf = df.select(xxhash64(key).as("h"))
      .stat.bloomFilter("h", expectedItems, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Membership probe against a serialized filter from [[buildBloom]]:
    * true if `key` MIGHT be in the set (false positives ≈ fpp), false
    * only if it is DEFINITELY absent. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    toCol(BloomFilterMightContain(Literal(bloom, BinaryType),
      toExpr(xxhash64(key))))
}
