package graft.search

import org.apache.spark.sql.SparkSession

/** SearcherLifetimeManager analog (reference:
  * /root/reference/src/Lucene.Net/Search/SearcherLifetimeManager.cs
  * :60-200): "search-session" pinning — record() captures the current
  * index view under a token, acquire(token) returns that SAME view for
  * follow-on pages of the session even though the index moved on, and
  * prune(PruneByAge) retires old views. The reference pins IndexSearcher
  * refs in a RAM map; here a recorded view is a commit-point SNAPSHOT
  * (metadata-sized, crash-safe — [[graft.build.Snapshots]]) and acquire
  * opens the point-in-time reader, so a "session" survives the driver
  * too. The record-time map is the manager's own state, like the
  * reference's.
  *
  * PruneByAge semantics (:169-199): drop views older than maxAgeSec,
  * but the NEWEST view is always kept regardless of age. */
final class SearcherLifetime(spark: SparkSession, dir: String) {

  private val live = scala.collection.concurrent.TrieMap.empty[Long, Long]

  /** Capture the current view; returns the token for acquire(). */
  def record(nowMs: Long): Long = {
    val id = graft.build.Snapshots.create(spark, dir)
    live.put(id, nowMs)
    id
  }

  /** The pinned view, or None if the token was pruned/released
    * (the reference returns null). */
  def acquire(token: Long): Option[IndexReader] =
    if (live.contains(token)) Some(IndexReader.atSnapshot(spark, dir, token))
    else None

  /** Explicit release (the reference's Release(searcher)). */
  def release(token: Long): Unit =
    if (live.remove(token).isDefined)
      graft.build.Snapshots.release(spark, dir, token)

  /** PruneByAge: retire views older than `maxAgeSec` at `nowMs`, always
    * keeping the newest. Returns the released tokens. */
  def prune(maxAgeSec: Double, nowMs: Long): Seq[Long] = {
    val entries = live.toSeq
    if (entries.isEmpty) return Nil
    val newest = entries.maxBy(_._2)._1
    val dead = entries.collect {
      case (tok, t) if tok != newest && (nowMs - t) / 1000.0 > maxAgeSec => tok
    }
    dead.foreach(release)
    dead
  }

  def recorded: Seq[Long] = live.keys.toSeq.sorted
}
