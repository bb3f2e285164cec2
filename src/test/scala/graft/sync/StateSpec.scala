package graft.sync

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.Streams

/** build_state semantics from tap-redshift/src/sync.py:215-257 +
  * state.json round-trip. */
class StateSpec extends AnyFunSuite {

  test("incremental stream carries bookmark forward when replication key matches") {
    val raw = SyncState(
      currentlySyncing = Some("warehouse_visitor"),
      bookmarks = Map("warehouse_visitor" -> Bookmark(
        Some("o_orderdate"), Some("1999-01-01T00:00:00"), Some(123L))))
    val st = Bookmarks.buildState(raw, Streams.all)
    assert(st.currentlySyncing.contains("warehouse_visitor"))
    val bm = st.bookmark("warehouse_visitor")
    assert(bm.replicationKey.contains("o_orderdate"))
    assert(bm.replicationKeyValue.contains("1999-01-01T00:00:00"))
    assert(bm.version.contains(123L))
  }

  test("bookmark value dropped when replication key changed") {
    val raw = SyncState(bookmarks = Map("warehouse_visitor" ->
      Bookmark(Some("other_key"), Some("1999-01-01T00:00:00"), Some(7L))))
    val bm = Bookmarks.buildState(raw, Streams.all).bookmark("warehouse_visitor")
    assert(bm.replicationKey.contains("o_orderdate")) // re-seeded from config
    assert(bm.replicationKeyValue.isEmpty)            // stale value discarded
    assert(bm.version.contains(7L))
  }

  test("full-table stream starts versionless; version falls back to epoch") {
    val st = Bookmarks.buildState(SyncState(), Streams.all)
    assert(st.bookmark(Streams.accounts.streamName) == Bookmark())
    val v = Bookmarks.streamVersion(st, Streams.accounts.streamName, nowMs = 42L)
    assert(v == 42L)
    val st2 = st.withBookmark("s", _.copy(version = Some(9L)))
    assert(Bookmarks.streamVersion(st2, "s", nowMs = 42L) == 9L)
  }

  test("state JSON round-trips") {
    val st = SyncState(Some("a"), Map(
      "a" -> Bookmark(Some("k"), Some("v"), Some(1L)),
      "b" -> Bookmark(None, None, Some(2L))))
    assert(Bookmarks.fromJson(Bookmarks.toJson(st)) == st)
    val empty = SyncState()
    assert(Bookmarks.fromJson(Bookmarks.toJson(empty)) == empty)
    assert(Bookmarks.toJson(empty).contains(""""currently_syncing":null"""))
  }

  test("message rendering matches Singer shapes") {
    assert(Messages.volumeMessage("s", 5) ==
      """{"type":"VOLUME","stream":"s","count":5}""")
    assert(Messages.activateVersionMessage("s", 9) ==
      """{"type":"ACTIVATE_VERSION","stream":"s","version":9}""")
    assert(Messages.stateMessage(SyncState()).startsWith("""{"type":"STATE","value":"""))
    val schema = Messages.schemaMessage(Streams.accounts, Seq("accountId" -> "string"))
    assert(schema.contains(""""key_properties":["c_custkey"]"""))
    assert(schema.contains(""""accountId":{"type":["null","string"]}"""))
  }
}
