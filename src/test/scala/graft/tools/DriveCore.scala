package graft.tools
import graft.core._
/** Manual smoke-drive of the core public API (used by /verify). */
object DriveCore {
  def main(args: Array[String]): Unit = {
    val a = "0d5afdd6-54a0-11eb-936d-0a8939501751"
    val b = "e1e896df-54a0-11eb-a26c-0e8d6a9fbf6f"
    val cur = VGtid.parse(s"MySQL56/$b:1-3,$a:1-2")
    val stop = VGtid.parse(s"MySQL56/$a:1-2,$b:1-3")
    println("SER=" + cur.serialize)
    println("EARLY_EXIT=" + !stop.after(cur))
    val advanced = cur.advance(a, 3)
    println("AFTER_ADVANCE=" + advanced.after(cur))
    val c = ShardCursor("ks", "-80", advanced.serialize, Some(LastPk("repo-9", "src/x.go")))
    println("B64=" + c.serialized.take(30) + "...")
    println("ROUNDTRIP=" + (ShardCursor.deserialize(c.serialized) == c))
    val st = SyncState.initial("ks:repo_content", "ks", Seq("-80","80-"), Map("ks" -> Map("80-" -> advanced.serialize)))
    println("STATE_JSON=" + st.toJson)
    try VGtid.parse("MariaDB/xyz:1") catch { case e: IllegalArgumentException => println("PROBE_FLAVOR=" + e.getMessage) }
    try VGtid.parse("MySQL56/uuid:1-2-3") catch { case e: Exception => println("PROBE_INTERVAL=" + e.getClass.getSimpleName) }
    println("PROBE_EMPTY_EQ=" + VGtid.parse("").positionEqual(VGtid.empty))
    println("PROBE_DUP_UUID=" + VGtid.parse(s"MySQL56/$a:1-3,$a:5-6").serialize)
  }
}
