package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two key
  * columns and range-cluster files by the interleaved value, so per-file
  * min/max footer statistics are tight in BOTH dimensions and a scan
  * filtered on either key (or a 2-D box) skips most files. The
  * multi-dimensional generalization of IO.writeRangeClustered, which is
  * tight in one dimension and spans the full range in every other.
  *
  * At 100 TB this is a layout decision, not a query: pay one clustered
  * write, then every selective scan over either column reads a small
  * fraction of files (Spark prunes parquet row groups from the same
  * stats). The z-value is pure bit arithmetic on the keys — deterministic,
  * codegen'd, no UDF.
  */
object ZOrder {

  /** Morton code of two non-negative integer columns, `bits` bits each
    * (values must be < 2^bits; 21 bits covers ids to ~2M and keeps the
    * interleaved value in the positive int64 range. Production layouts
    * first rank/scale each dimension into this range — percentile-ranking
    * is one distributed pass and makes the curve resistant to skew). */
  def zvalue(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftright(x.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Write `df` as `numFiles` parquet files clustered along the z-curve of
    * (cx, cy): range-partition by z-value, sort within partitions, write.
    * Readers get 2-D file skipping from the parquet footer stats with no
    * index structure. */
  def writeZOrdered(df: DataFrame, path: String, cx: String, cy: String,
      numFiles: Int, bits: Int = 21): Unit = {
    val z = zvalue(col(cx), col(cy), bits)
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }
}
