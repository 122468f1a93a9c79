package graft.functions

import org.apache.spark.sql.SparkSession

/** Once-per-live-session registration guard shared by every kernel object.
  *
  * Keyed by the session object itself in a [[java.util.WeakHashMap]] rather
  * than by `System.identityHashCode(spark)`: identity hashes can be reused
  * by a new SparkSession after an old one is GC'd (which would silently skip
  * registration → "undefined function" at analysis), and a string-keyed set
  * grows without bound across session churn. Weak keys give both properties
  * at once — two live sessions never collide, and an entry vanishes with its
  * session.
  *
  * `synchronized`: a thread losing the race must BLOCK until the winner
  * finishes createOrReplaceTempFunction — otherwise a pooled Verify query
  * can analyze against a not-yet-registered name.
  */
object SessionRegistry {
  private val registered =
    new java.util.WeakHashMap[SparkSession, java.util.HashSet[String]]()

  /** Run `register` once per (live session, key). */
  def once(key: String)(register: SparkSession => Unit): Unit = synchronized {
    val spark = SparkSession.active
    val keys =
      registered.computeIfAbsent(spark, _ => new java.util.HashSet[String]())
    if (keys.add(key)) register(spark)
  }
}
