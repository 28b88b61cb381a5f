package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Cursor serde round-trip + initial-state precedence — semantics of
  * `cmd/internal/types.go:112-137` (round-trip) and
  * `cmd/airbyte-source/read.go:151-184` (state file beats starting_gtids).
  */
class CursorSpec extends AnyFunSuite {

  private val pos = "MySQL56/0d5afdd6-54a0-11eb-936d-0a8939501751:1-177"

  test("cursor base64 serde round-trips with and without last_known_pk") {
    val c1 = ShardCursor("ks", "-80", pos, None)
    assert(ShardCursor.deserialize(c1.serialized) == c1)
    val c2 = ShardCursor("ks", "80-", pos, Some(LastPk("repo-1", "src/a.scala")))
    assert(ShardCursor.deserialize(c2.serialized) == c2)
  }

  test("sync state JSON round-trips") {
    val st = SyncState.empty
      .updated("ks:repo_content", ShardCursor("ks", "-80", pos, None))
      .updated("ks:repo_content", ShardCursor("ks", "80-", "", Some(LastPk("r", "p"))))
    val back = SyncState.fromJson(st.toJson)
    assert(back == st)
  }

  test("initial state: blanks per shard, starting_gtids override") {
    val st = SyncState.initial("ks:t", "ks", Seq("-80", "80-"),
      startingGtids = Map("ks" -> Map("-80" -> pos)))
    assert(st.cursorFor("ks:t", "-80").get.position == pos)
    assert(st.cursorFor("ks:t", "80-").get.position == "")
  }

  test("state file beats starting_gtids (reference read.go:169-180)") {
    val fromFile = SyncState.empty.updated("ks:t", ShardCursor("ks", "-80", "MySQL56/e1e896df-54a0-11eb-a26c-0e8d6a9fbf6f:1-3", None))
    val st = SyncState.initial("ks:t", "ks", Seq("-80"),
      startingGtids = Map("ks" -> Map("-80" -> pos)), prior = fromFile)
    assert(st.cursorFor("ks:t", "-80").get.position.contains("e1e896df"))
  }

  test("readState: per-stream sync-mode precedence (read.go:151-184, read_test.go:15-115)") {
    val shards = Seq("-80", "80-")
    val statePos = "MySQL56/e1e896df-54a0-11eb-a26c-0e8d6a9fbf6f:1-3"
    val inc = ConfiguredStream("t", "ks", "incremental")
    val full = ConfiguredStream("t", "ks", "full_refresh")
    val prior = SyncState.empty.updated("ks:t", ShardCursor("ks", "-80", statePos, None))
    val gtids = Map("ks" -> Map("-80" -> pos))

    // incremental + state present → state kept verbatim (starting_gtids ignored)
    val s1 = SyncState.readState(prior, Seq(inc), shards, gtids)
    assert(s1.cursorFor("ks:t", "-80").get.position == statePos)
    // incremental + no state → starting_gtids, blanks elsewhere
    val s2 = SyncState.readState(SyncState.empty, Seq(inc), shards, gtids)
    assert(s2.cursorFor("ks:t", "-80").get.position == pos)
    assert(s2.cursorFor("ks:t", "80-").get.position == "")
    // full_refresh → state REPLACED by initial cursors even when present
    val s3 = SyncState.readState(prior, Seq(full), shards, gtids)
    assert(s3.cursorFor("ks:t", "-80").get.position == pos)
    val s4 = SyncState.readState(prior, Seq(full), shards, Map.empty)
    assert(s4.cursorFor("ks:t", "-80").get.position == "")
    // other streams' state untouched
    val prior2 = prior.updated("ks:u", ShardCursor("ks", "-80", statePos, None))
    val s5 = SyncState.readState(prior2, Seq(full), shards, Map.empty)
    assert(s5.cursorFor("ks:u", "-80").get.position == statePos)
  }

  test("forResume: LastKnownPk clears position unless use_gtid_with_table_pks (database.go:312-314)") {
    val midCopy = ShardCursor("ks", "-80", pos, Some(LastPk("r", "p")))
    assert(midCopy.forResume(useGtidWithTablePks = false).position == "")
    assert(midCopy.forResume(useGtidWithTablePks = false).lastPk.nonEmpty)
    assert(midCopy.forResume(useGtidWithTablePks = true) == midCopy)
    val postCopy = ShardCursor("ks", "-80", pos, None)
    assert(postCopy.forResume(useGtidWithTablePks = false) == postCopy)
  }
}
