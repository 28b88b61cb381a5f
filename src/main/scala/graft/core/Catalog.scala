package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** One stream of a configured catalog — the reference's `ConfiguredStream`
  * (`cmd/internal/types.go:76-91`): a stream (≈ table) plus the requested
  * `sync_mode`. `full_refresh` re-ingests from scratch; `incremental`
  * resumes from state; any other value (the reference treats non-incremental
  * modes like `append` as a cursor reset) also ignores prior state.
  */
final case class ConfiguredStream(name: String, namespace: String, syncMode: String) {

  /** Reference `IncrementalSyncRequested()` (`types.go:88-90`). */
  def incrementalSyncRequested: Boolean = syncMode == "incremental"

  /** State key construction mirrors `read.go:108`: `namespace + ":" + name`. */
  def stateKey: String = s"$namespace:$name"
}

/** The reference's `ConfiguredCatalog{Streams}` (`types.go:76-79`), parsed
  * from the Airbyte-shaped catalog JSON the `read` verb takes:
  * `{"streams":[{"stream":{"name":…,"namespace":…},"sync_mode":…}]}`.
  */
final case class ConfiguredCatalog(streams: Seq[ConfiguredStream])

object ConfiguredCatalog {
  private val mapper = new ObjectMapper()

  def fromJson(json: String): ConfiguredCatalog = {
    val root = mapper.readTree(json)
    val streams = Option(root.get("streams")).map(_.elements().asScala.toSeq).getOrElse(Nil)
      .map { s =>
        val inner = Option(s.get("stream")).getOrElse(s)
        ConfiguredStream(
          name = inner.get("name").asText(),
          namespace = Option(inner.get("namespace")).map(_.asText()).getOrElse(""),
          syncMode = Option(s.get("sync_mode")).map(_.asText()).getOrElse("incremental"))
      }
    ConfiguredCatalog(streams)
  }

  def toJson(c: ConfiguredCatalog): String = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("streams")
    c.streams.foreach { s =>
      val n = arr.addObject()
      val inner = n.putObject("stream")
      inner.put("name", s.name)
      inner.put("namespace", s.namespace)
      n.put("sync_mode", s.syncMode)
    }
    mapper.writeValueAsString(root)
  }
}
