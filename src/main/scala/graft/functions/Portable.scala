package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable building blocks for the extension operators.
  *
  * Everything here is chosen so the DuckDB oracle can compute the exact
  * same value: md5-derived 32-bit hashes (identical hex in every engine),
  * integer arithmetic instead of float division, and parts-per-million
  * integer ratios instead of ROUND (see Core.round2p's scaladoc for why
  * cross-engine ROUND is unsafe).
  */
object Portable {

  /** Mersenne prime 2^31-1, the modulus for all hash mixing. */
  val P: Long = 2147483647L

  /** Portable 32-bit hash: first 8 hex chars of md5 as a long in [0, 2^32).
    * DuckDB twin: `('0x' || substr(md5(x), 1, 8))::BIGINT`.
    * md5 beats xxhash/murmur here because every engine agrees on it.
    * Computed by the native codegen expression (graft.functions.H32);
    * `h32Builtin` keeps the built-in composition as its differential
    * test twin (H32Spec). */
  def h32(c: Column): Column = H32(c)

  /** Built-in-functions form of h32 — same value, three string
    * allocations per row; retained for differential testing. */
  def h32Builtin(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Exact integer division for non-negative longs below 2^53:
    * `(a - a % b) / b` — the numerator is an exact multiple of b and fits
    * a double, so the float division is exact. DuckDB twin: `a // b`. */
  def idiv(a: Column, b: Column): Column =
    ((a - a % b) / b).cast("long")

  /** Integer ratio in parts-per-million: `(num * 1e6) // den`. */
  def ppm(num: Column, den: Column): Column =
    idiv(num * lit(1000000L), den)
}
