package graft.core

import org.apache.spark.sql.types._

/** One row of the repo-content lake table (BASELINE.json `input_hint`):
  * merge key = (repo, path); per-row invariant vs the reference replay is
  * sha256(content) equality.
  */
final case class RepoFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** Primary-key watermark for the COPY (initial snapshot) phase — the analogue
  * of the reference's `TableCursor.last_known_pk`
  * (`proto/psdbconnect.v1alpha1.proto:36-41`, LASTPK handling at
  * `cmd/internal/planetscale_edge_database.go:383-393`).
  */
final case class LastPk(repo: String, path: String)

/** One change event of the sharded changelog — the Spark-native analogue of a
  * Vitess `VEvent` ROW change consumed at
  * `cmd/internal/planetscale_edge_database.go:364-425`.
  *
  * `op` ∈ {insert, update, delete}. The reference emits After-images only and
  * drops deletes (`planetscale_edge_database.go:398-410`); parity mode in the
  * apply layer reproduces that, while the engine natively supports deletes.
  */
final case class ChangeEvent(
    keyspace: String,
    shard: String,
    vgtid: String,
    event_seq: Long,
    op: String,
    before: Option[RepoFile],
    after: Option[RepoFile],
    is_copy_phase: Boolean,
    last_pk: Option[LastPk],
    schema_version: Int)

object ChangeEvent {
  val OpInsert = "insert"
  val OpUpdate = "update"
  val OpDelete = "delete"

  val rowSchema: StructType = StructType(Seq(
    StructField("repo", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("commit", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("content", StringType, nullable = false)))

  /** Optional metadata columns — the analogue of the reference's injected
    * `_planetscale_metadata {vgtid_position, extracted_at, sequence_number}`
    * (`planetscale_edge_database.go:560-574`, `spec.json:63`). Tables created
    * with this extended schema get per-row provenance stamped at apply time.
    */
  val metaFields: Seq[StructField] = Seq(
    StructField("_graft_vgtid", StringType, nullable = true),
    StructField("_graft_seq", LongType, nullable = true),
    StructField("_graft_extracted_at", TimestampType, nullable = true))

  val rowSchemaWithMeta: StructType = StructType(rowSchema.fields ++ metaFields)

  /** The landing schema a RunConfig's flags select: wire → the typed
    * repo_profile landing; include_metadata appends the `_graft_*`
    * provenance columns to EITHER base (the flags compose).
    */
  def landingSchemaFor(wirePayload: Boolean, includeMetadata: Boolean): StructType = {
    val base =
      if (wirePayload) WireTableSpec.repoProfile.landingSchema else rowSchema
    if (includeMetadata) StructType(base.fields ++ metaFields) else base
  }

  /** Landing schema for an ARBITRARY wire table (discover→read loop):
    * the table's typed landing, optionally with the `_graft_*` provenance
    * columns appended — same composition rule as the flag form above.
    */
  def landingSchemaFor(wt: WireTable, includeMetadata: Boolean): StructType = {
    val base = wt.spec.landingSchema
    if (includeMetadata) StructType(base.fields ++ metaFields) else base
  }

  val schema: StructType = StructType(Seq(
    StructField("keyspace", StringType, nullable = false),
    StructField("shard", StringType, nullable = false),
    StructField("vgtid", StringType, nullable = false),
    StructField("event_seq", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("before", rowSchema, nullable = true),
    StructField("after", rowSchema, nullable = true),
    StructField("is_copy_phase", BooleanType, nullable = false),
    StructField("last_pk", StructType(Seq(
      StructField("repo", StringType, nullable = false),
      StructField("path", StringType, nullable = false))), nullable = true),
    StructField("schema_version", IntegerType, nullable = false)))
}
