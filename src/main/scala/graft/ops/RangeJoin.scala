package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bin replication — the standard trick
  * that turns a range predicate into an equi-join so Spark never falls
  * back to a nested-loop plan.
  *
  * Each interval row replicates to every fixed-width bin it overlaps;
  * each point row maps to exactly one bin; the join runs on
  * (keys…, bin) with the exact range predicate as a residual filter.
  * A point matches an interval in exactly one bin (the point's own), so
  * no dedup pass is needed.
  *
  * Scale notes (100 TB): work is one hash shuffle on (keys, bin) — the
  * same cost class as any equi-join — plus a replication factor of
  * ceil(intervalWidth / binWidth) + 1 on the interval side only. Pick
  * `binWidth` near the typical interval width: too small replicates
  * intervals heavily, too large packs many points per bin and the
  * residual filter does the work. Skewed hot bins are AQE's skew-join
  * territory, same as any skewed equi-join key.
  */
object RangeJoin {

  /** Inner join of `points` (numeric `ptCol`) to `intervals`
    * (`loCol` ≤ pt ≤ `hiCol`, inclusive ends), with optional equality
    * `keys` present in both inputs. Column sets must be disjoint apart
    * from `keys` (select/alias beforehand).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], ptCol: String, loCol: String,
                      hiCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", bin(col(ptCol), binWidth))
    val iv = intervals.withColumn("__bin",
      explode(sequence(bin(col(loCol), binWidth), bin(col(hiCol), binWidth))))
    p.join(iv, keys :+ "__bin")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval-overlap inner join: `left` rows with intervals
    * [`lLo`,`lHi`] × `right` rows with intervals [`rLo`,`rHi`] where the
    * intervals overlap (inclusive ends: lLo ≤ rHi AND rLo ≤ lHi), with
    * optional equality `keys` present in both inputs. Column sets must be
    * disjoint apart from `keys`.
    *
    * Both sides replicate to every `binWidth` bin their interval covers;
    * the join runs on (keys…, bin). An overlapping pair co-occurs in
    * every bin the *intersection* covers, so to emit each pair exactly
    * once we keep it only in its ownership bin — the bin of
    * greatest(lLo, rLo), the intersection's left edge, which both sides
    * provably cover when they overlap. No distinct pass, so the result
    * streams out of the join without a second shuffle.
    *
    * Scale notes (100 TB): one hash shuffle on (keys, bin), replication
    * factor ceil(width/binWidth)+1 on BOTH sides — pick binWidth near
    * the typical interval width. Hot bins (popular key × dense hour) are
    * AQE skew-join territory, same as any equi-join.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          keys: Seq[String], lLo: String, lHi: String,
                          rLo: String, rHi: String,
                          binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = left.withColumn("__bin",
      explode(sequence(bin(col(lLo), binWidth), bin(col(lHi), binWidth))))
    val r = right.withColumn("__bin",
      explode(sequence(bin(col(rLo), binWidth), bin(col(rHi), binWidth))))
    l.join(r, keys :+ "__bin")
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        col("__bin") === bin(greatest(col(lLo), col(rLo)), binWidth))
      .drop("__bin")
  }

  /** floor-division bin id, exact for |value| < 2^53 and correct for
    * negative values (pmod keeps the remainder non-negative)
    */
  private def bin(c: Column, w: Long): Column = {
    val cl = c.cast("long")
    ((cl - pmod(cl, lit(w))) / lit(w)).cast("long")
  }
}
