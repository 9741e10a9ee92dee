package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Write-side z-order clustering: arrange rows so parquet min/max footer
  * stats prune scans for filters on EITHER clustered dimension.
  *
  * `repartitionByRange` on the z-value gives each output file a
  * contiguous slice of the space-filling curve; the within-partition sort
  * tightens per-row-group stats inside each file. Both dimensions then
  * have bounded spread per file (a single-column sort leaves the other
  * dimension spanning its full range in every file — ZOrderSpec measures
  * the difference).
  *
  * 100 TB shape: one range shuffle over the data (sampling pass picks the
  * range bounds), identical cost to the single-column sorted write it
  * replaces; the curve key is the codegen'd
  * [[graft.functions.ZOrderLong]] expression, no UDF in the path.
  */
object ZOrderLayout {
  def cluster(df: DataFrame, z: Column, numFiles: Int): DataFrame =
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)

  /** Convenience: cluster on two integral columns masked to `bits`. */
  def cluster2(df: DataFrame, a: Column, b: Column, bits: Int,
      numFiles: Int): DataFrame =
    cluster(df, graft.functions.ZOrder.zorder(bits, a, b), numFiles)
}
