package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Date/time scalar kernels.
  *
  * [[yearFraction]] reproduces the reference's `_year` fractional-year
  * rewrite (`/root/reference/src/utils.py:411-412`,
  * `year + month/12 + day/365`) as a pure Column expression — the
  * reference mutates its datetime columns in place at first access
  * (`improve_data_quality.py:111-115`); here it's a projection, applied
  * only where a numeric view of a timestamp is wanted.
  */
object DateFns {
  def yearFraction(ts: Column): Column =
    (year(ts).cast(DoubleType) +
      month(ts).cast(DoubleType) / 12.0 +
      dayofmonth(ts).cast(DoubleType) / 365.0)
}
