package graft.streaming

import graft.core.ChangeEvent
import graft.genlog.{EventGen, GenConfig}

/** Transport seam — the analogue of the reference's
  * `vtgateservice.VitessClient` interface (the sync loop is written against
  * it, `cmd/internal/planetscale_edge_database.go:291-340`, and its mocks
  * implement it, `cmd/internal/mock_types.go:63-116`). Everything downstream
  * of event supply — offsets, partition planning, LWW apply, snapshot
  * commit, cursors — consumes change events ONLY through this trait, so a
  * real VStream / binlog / Kafka tail plugs in by implementing it; no edits
  * to the DSv2 source or reader factory.
  *
  * Contract:
  *  - implementations are `Serializable`: instances ship inside the reader
  *    factory to executor tasks (construct heavy non-serializable handles
  *    lazily inside `events`, once per call, like a codec);
  *  - `events(shard, from, to)` must be DETERMINISTIC for a committed
  *    range: exactly-once replay re-reads ranges after a crash, and two
  *    reads of the same range must produce the same events (a real binlog
  *    tail satisfies this naturally — positions address immutable log
  *    entries);
  *  - `head(shard)` is the peek (A2): the current exclusive upper bound of
  *    available positions, monotonically non-decreasing across calls.
  *
  * Position↔GTID addressing ([[graft.genlog.EventGen.positionForGtid]] /
  * `positionForPk`) stays OUTSIDE the trait: it maps resume state onto the
  * offset space and is part of the source's addressing scheme, not of event
  * supply — the reference likewise keeps cursor mapping in the edge
  * database, not in the VStream client.
  */
trait ShardEventTransport extends Serializable {

  /** Current head (exclusive upper bound of available positions) — the peek. */
  def head(shardIdx: Int): Long

  /** Open the change-event stream of one shard over positions [from, to). */
  def events(shardIdx: Int, from: Long, to: Long): Iterator[ChangeEvent]
}

/** The synthetic closed-form changelog ([[EventGen]]) as a transport — the
  * engine's equivalent of the reference's mocked VitessClient: every test and
  * benchmark drives the REAL sync loop through this impl.
  */
final class SyntheticTransport(c: GenConfig) extends ShardEventTransport {

  override def head(shardIdx: Int): Long = EventGen.totalPerShard(shardIdx, c)

  override def events(shardIdx: Int, from: Long, to: Long): Iterator[ChangeEvent] =
    if (to <= from) Iterator.empty
    else {
      // one path-table per open (per task), reused across the whole range
      val paths = EventGen.sortedPaths(c)
      (from until to).iterator.map(pos => EventGen.eventAt(shardIdx, pos, c, paths))
    }
}

object ShardEventTransport {

  /** Resolve the transport for a source configuration: the synthetic
    * closed-form changelog by default, or a user implementation named by the
    * `transportClass` option — constructed reflectively via a
    * single-argument `(GenConfig)` constructor (for transports that need the
    * addressing config) or a no-arg constructor.
    */
  def forConfig(c: GenConfig, transportClass: Option[String]): ShardEventTransport =
    transportClass match {
      case None => new SyntheticTransport(c)
      case Some(name) =>
        // context classloader first: a real transport impl arrives via
        // --jars / spark.jars on Spark's mutable session classloader, which
        // the loader that defined graft's own classes cannot see
        val loader = Option(Thread.currentThread().getContextClassLoader)
          .getOrElse(getClass.getClassLoader)
        val cls = Class.forName(name, true, loader)
        if (!classOf[ShardEventTransport].isAssignableFrom(cls))
          throw new graft.core.GraftValidationException(
            s"transportClass $name does not implement ShardEventTransport")
        val byConfig = cls.getConstructors.find(ctor =>
          ctor.getParameterCount == 1 && ctor.getParameterTypes()(0) == classOf[GenConfig])
        val inst = byConfig match {
          case Some(ctor) => ctor.newInstance(c)
          case None => cls.getDeclaredConstructor().newInstance()
        }
        inst.asInstanceOf[ShardEventTransport]
    }
}
