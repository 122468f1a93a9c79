package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join: for every left row, attach the latest
  * right row whose time is ≤ the left row's time, within the same key —
  * the temporal-enrichment primitive (quotes→trades, config→events,
  * last-purchase→click) that plain equi/range joins can't express without
  * a per-row subquery.
  *
  * Spark-first design (no custom physical operator needed): union both
  * sides tagged, then a single running-`max` window over
  * (key, time, side) picks each left row's most recent preceding right
  * struct. Cost at 100 TB: ONE hash shuffle of both inputs on the key +
  * a per-partition sort — identical to the cost of any groupBy over the
  * same key, with no join-explosion term and no nested-loop fallback
  * (a naive l.join(r, l.ts >= r.ts) is a broadcast-nested-loop plan).
  * The right payload rides as a struct whose first field is the right
  * timestamp, so the running max is ordered by time; putting a unique id
  * second makes the winner deterministic when timestamps tie.
  */
object AsOfJoin {

  /** `keys`: equality columns present in both inputs.
    * `leftTs` / `rightTs`: orderable time (or any orderable) columns.
    * `payload`: right-side columns to attach; emitted as `prefix+name`,
    * NULL when no right row precedes the left row (left-outer as-of).
    * Matching is inclusive: a right row at exactly the left time matches.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               prefix: String = "r_"): DataFrame = {
    val leftCols = left.columns.toSeq
    // one struct column carries (rightTs, payload...) through the union;
    // max() over it is ordered by rightTs first, payload head second
    val rStruct = struct((col(rightTs) +: payload.map(col)): _*)
    // ASOF semantics (DuckDB oracle): a right row with a NULL time never
    // matches. Unfiltered it would sort first under __t.asc and its struct
    // (non-null, null first field) would seed the running max.
    val rSide = right.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++ Seq(col(rightTs).as("__t"), lit(0).as("__side"),
        rStruct.as("__r")) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lSide = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__t"), lit(1).as("__side"),
        lit(null).cast(rSide.schema("__r").dataType).as("__r")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    // right rows sort BEFORE left rows at equal time → inclusive match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedCol = max(col("__r")).over(w).as("__m")
    val out = rSide.unionByName(lSide)
      .select(col("*"), matchedCol)
      .filter(col("__side") === 1)
    out.select(
      leftCols.map(col) ++
        (rightTs +: payload).map(name =>
          col("__m").getField(name).as(prefix + name)): _*)
  }

  /** As-of join with a staleness bound — the feature-store read: a match
    * older than `maxAgeSeconds` is treated as ABSENT and every attached
    * column nulls out, so consumers can never train on an expired feature
    * value. Timestamp columns age via unix_micros (the wire-portable
    * idiom — raw timestamp subtraction has no substrait form); numeric
    * time columns compare in their own units. Same single-shuffle
    * join-free plan as [[asofJoin]]; the staleness check is a narrow
    * projection on top.
    */
  def asofJoinWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String, payload: Seq[String],
                     maxAgeSeconds: Long, prefix: String = "r_"): DataFrame = {
    val joined = asofJoin(left, right, keys, leftTs, rightTs, payload, prefix)
    val isTs = left.schema(leftTs).dataType.typeName.startsWith("timestamp")
    val (age, bound) =
      if (isTs)
        (unix_micros(col(leftTs).cast("timestamp_ltz")) -
          unix_micros(col(prefix + rightTs).cast("timestamp_ltz")),
          lit(maxAgeSeconds * 1000000L))
      else (col(leftTs).cast("long") - col(prefix + rightTs).cast("long"),
        lit(maxAgeSeconds))
    val fresh = col(prefix + rightTs).isNotNull && age <= bound
    joined.select(
      left.columns.toSeq.map(col) ++
        (rightTs +: payload).map(n =>
          when(fresh, col(prefix + n)).as(prefix + n)): _*)
  }
}
