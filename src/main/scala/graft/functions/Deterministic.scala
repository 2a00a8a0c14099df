package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Helpers that make float results bit-identical between Spark and the DuckDB
  * oracle (SURVEY.md §7.4): the testdata measures are doubles with exactly two
  * decimal digits, so summing them as decimals is exact and order-independent,
  * and casting the exact decimal total back to double yields the same IEEE
  * value on both engines. A plain `sum(double)` would depend on reduction
  * order and differ in the last ulps between engines / partitionings.
  */
object Deterministic {

  /** Exact sum of a 2-dp double measure, returned as double.
    * Oracle equivalent: `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact decimal product of two 2-dp measures (scale 4), e.g.
    * `price * (1 - discount)`. Keep operand precision tight so chained
    * products stay inside decimal(38) on both engines.
    */
  def dmul(a: Column, b: Column): Column =
    a.cast(DecimalType(12, 2)) * b.cast(DecimalType(4, 2))

  /** Deterministic mean: exact decimal sum divided by the count — a single
    * IEEE double division, identical on both engines.
    * Oracle: `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)`.
    */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Order-independent sum for SMALL magnitudes (|x| ≲ 10¹⁷): decimal with
    * 20 fractional digits — finer than a double's ~16 significant digits
    * for unit-scale values, so each addend rounds identically on every
    * partitioning and the decimal total is exact. Used for embedding-mean
    * updates, where [[dsum]]'s 2-dp money scale would destroy the signal.
    * Oracle equivalent: `CAST(SUM(CAST(x AS DECIMAL(38,20))) AS DOUBLE)` —
    * mirroring the decimal sum keeps the only cross-engine gap at the
    * per-addend 1e-20 rounding (possibly different rounding modes at that
    * digit), orders below the round(·,9) comparisons downstream; a plain
    * double `avg` oracle would instead accumulate ~n·ulp of running-sum
    * error.
    */
  def dsumFine(c: Column): Column =
    sum(c.cast(DecimalType(38, 20))).cast("double")

  /** 32-bit word hash computable identically in DuckDB:
    * Spark `conv(substr(md5(w),1,8),16,10)` ==
    * DuckDB `CAST('0x' || substr(md5(w),1,8) AS BIGINT)`.
    * Used where the oracle must reproduce our hash values (rolling-hash
    * fingerprints); pure-Spark paths use the faster xxhash64 instead.
    */
  def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")
}
