package graft

/** DuckDB-runnable ANSI oracles for every SQL-expressible `SparkEntry.queries`
  * entry. Column names/aliases match the Spark side exactly (driver compare
  * sorts columns by name before hashing). Engine-internal operators (DSv2
  * source, lake merge, MinHash/SimHash/LSH, rolling-hash fingerprint) are
  * intentionally absent → driver records a rows-only check; their correctness
  * lives in ScalaTest suites.
  *
  * Determinism notes: double aggregates are cast to DECIMAL pre-sum (exact,
  * order-free); ratios use integer `//` division; DuckDB `regexp_replace`
  * needs the 'g' flag to match Spark's replace-all default.
  */
object OracleSql {

  private val langCase: String = {
    // mirrors TextFunctions.langId: scores per lang over ' '||text||' ',
    // predicted = first (alphabetical) language attaining the max score
    val scores = graft.functions.TextFunctions.langMarkers.map { case (lang, kws) =>
      val sum = kws.map { kw =>
        s"((length(p)-length(replace(p,'$kw','')))//${kw.length})"
      }.mkString(" + ")
      lang -> s"($sum)"
    }
    val m = s"greatest(${scores.map(_._2).mkString(", ")})"
    val cases = scores.map { case (l, e) => s"WHEN $e = m THEN '$l'" }.mkString(" ")
    s"""SELECT doc_id, lang, CASE $cases END AS predicted
       FROM (SELECT doc_id, lang, $m AS m, p FROM
         (SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents))""".stripMargin
  }

  /** The planted near-dup corpus (mirrors `SparkEntry.plantedDocs`): each
    * document plus a copy with the last two words dropped, id-offset by 1e6.
    */
  private val plantedCorpusSql: String =
    """SELECT doc_id, text FROM documents
       UNION ALL
       SELECT doc_id + 1000000 AS doc_id,
              array_to_string(w[1:greatest(len(w)-2,1)], ' ') AS text
       FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
             FROM documents)"""

  /** Distinct character k-shingles of `expr` (mirrors `TextFunctions.shingles`). */
  private def shingleSql(expr: String, k: Int): String =
    s"""CASE WHEN length($expr) < $k THEN [substring($expr, 1, $k)]
        ELSE list_distinct([substring($expr, i, $k)
                            for i in range(1, length($expr) - ${k - 2})]) END"""

  /** Integer per-mille Jaccard of two shingle lists (mirrors `jaccardPermille`). */
  private def jaccSql(a: String, b: String): String =
    s"""CASE WHEN len(list_distinct(list_concat($a, $b))) = 0 THEN 0
        ELSE (len(list_intersect($a, $b)) * 1000)
             // len(list_distinct(list_concat($a, $b))) END"""

  /** Full simhash mirror: per-token `md5_number_lower` (the Spark side uses
    * the same md5-bytes-8..15-little-endian hash), 64 vote sums, bits
    * recombined — then the brute-force hamming≤3 pair set, which the 4×16-bit
    * chunk LSH reproduces exactly (pigeonhole recall 1.0).
    */
  private val simhashOracle: String = {
    val bits = (0 until 64).map { j =>
      // bit weight as an unsigned literal: DuckDB's << range-checks 1<<63
      val w = java.lang.Long.toUnsignedString(1L << j)
      s"(CASE WHEN SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN $w::UBIGINT ELSE 0::UBIGINT END)"
    }.mkString(" + ")
    s"""WITH corpus AS ($plantedCorpusSql),
        tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '${"\\"}s+')) AS t FROM corpus),
        hs AS (SELECT doc_id, md5_number_lower(t) AS h FROM tok),
        sim AS (SELECT doc_id, $bits AS sim FROM hs GROUP BY doc_id)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sim, b.sim)) <= 3"""
  }

  /** Brute-force exact-Jaccard pair set at the ≥0.7 threshold, computed
    * relationally (unnest shingles → equi-join → per-pair intersection
    * count; |A∪B| = |A|+|B|−|A∩B|) — pairs sharing no shingle have jacc 0
    * and drop out naturally, so this is exhaustive without n² list ops.
    */
  private val minhashOracle: String =
    s"""WITH corpus AS ($plantedCorpusSql),
        sh AS (SELECT doc_id, ${shingleSql("text", 20)} AS sh FROM corpus),
        sized AS (SELECT doc_id, len(sh) AS n FROM sh),
        ex AS (SELECT doc_id, unnest(sh) AS g FROM sh),
        inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
                  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT a_id, b_id, jacc_pm FROM (
          SELECT a_id, b_id, (i * 1000) // (na.n + nb.n - i) AS jacc_pm
          FROM inter
          JOIN sized na ON na.doc_id = a_id
          JOIN sized nb ON nb.doc_id = b_id)
        WHERE jacc_pm >= 700"""

  /** Full algorithm mirror of `VectorFunctions.lshTopK` (queries id<8, k=5,
    * dim=64, bits=4, tables=8, seed=7): the ±1 hyperplanes are the SAME
    * driver-side `planeSigns` arrays the Spark plan embeds, so bucket
    * assignment, multi-table candidate union, and cosine rank reproduce the
    * exact output — algorithm parity like `sim_knn_ivf`, not a recall bound.
    */
  private val lshOracle: String = {
    val (dim, bits, tables, seed, k) = (64, 4, 8, 7L, 5)
    val bucketExprs = (0 until tables).map { t =>
      val planes = graft.functions.VectorFunctions.planeSigns(dim, bits, seed + t * 7919L)
      val bitsSql = (0 until bits).map { b =>
        val arr = planes(b).map(d => if (d > 0) "1.0" else "-1.0").mkString("[", ",", "]")
        s"(CASE WHEN list_dot_product(v, $arr) >= 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString(" + ")
      s"(($bitsSql) * $tables + $t)"
    }
    s"""WITH emb AS (SELECT vec_id AS id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        sb AS (SELECT id, unnest([${bucketExprs.mkString(", ")}]) AS bucket FROM emb),
        cand AS (SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id
                 FROM sb q JOIN sb c USING (bucket)
                 WHERE q.id < 8 AND c.id <> q.id)
        SELECT query_id, neighbor_id, rank FROM (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id
              ORDER BY list_cosine_similarity(a.v, b.v) DESC, neighbor_id ASC) AS rank
          FROM cand JOIN emb a ON a.id = query_id JOIN emb b ON b.id = neighbor_id)
        WHERE rank <= $k"""
  }

  private val ngramJaccardOracle: String =
    s"""WITH corpus AS ($plantedCorpusSql),
        sa AS (SELECT doc_id, ${shingleSql("text", 5)} AS sh FROM corpus WHERE doc_id < 1000000),
        sb AS (SELECT doc_id - 1000000 AS doc_id, ${shingleSql("text", 5)} AS sh
               FROM corpus WHERE doc_id >= 1000000)
        SELECT a.doc_id AS a_id, ${jaccSql("a.sh", "b.sh")} AS jacc_pm
        FROM sa a JOIN sb b USING (doc_id)"""

  /** text_quality mirror (integer per-milles, stopword hit counting,
    * composite score) — reused verbatim by the composed pipeline oracle.
    */
  private val qualityOracle: String =
    """SELECT doc_id, alpha_pm, space_pm, punct_pm,
         CASE WHEN tokens = 0 THEN 0 ELSE (stop_hits*1000) // tokens END AS stop_pm,
         ((alpha_pm*4 + tok_ok*3 + space_ok*3) // 10) AS quality FROM (
           SELECT doc_id, alpha_pm, space_pm, punct_pm, tokens,
             (length(p)-length(replace(p,' the ','')))//5
             + (length(p)-length(replace(p,' and ','')))//5
             + (length(p)-length(replace(p,' of ','')))//4
             + (length(p)-length(replace(p,' is ','')))//4
             + (length(p)-length(replace(p,' to ','')))//4
             + (length(p)-length(replace(p,' a ','')))//3
             + (length(p)-length(replace(p,' in ','')))//4
             + (length(p)-length(replace(p,' that ','')))//6 AS stop_hits,
             CASE WHEN tokens > 0 AND ((nonspace*1000) // tokens) BETWEEN 3000 AND 12000
                  THEN 1000 ELSE 0 END AS tok_ok,
             CASE WHEN space_pm BETWEEN 50 AND 400 THEN 1000 ELSE 0 END AS space_ok
           FROM (SELECT doc_id, ' ' || text || ' ' AS p,
             CASE WHEN length(text)=0 THEN 0
                  ELSE (length(regexp_replace(text,'[^A-Za-z]','','g'))*1000) // length(text) END AS alpha_pm,
             CASE WHEN length(text)=0 THEN 0
                  ELSE (length(regexp_replace(text,'[^ ]','','g'))*1000) // length(text) END AS space_pm,
             CASE WHEN length(text)=0 THEN 0
                  ELSE (length(regexp_replace(text,'[^.,!?;:]','','g'))*1000) // length(text) END AS punct_pm,
             length(regexp_replace(text,'\s+','','g')) AS nonspace,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text),'\s+')) END AS tokens
           FROM documents))"""

  // ---- cdc_replay_final_state oracle -------------------------------------
  //
  // Full relational mirror of the engine-side replay: EventGen's closed-form
  // changelog (splitmix64 h01 draws → repo/path/op per event) is re-derived
  // IN DuckDB, the LWW winner per key selected with arg_max, and the winner's
  // content string rebuilt byte-for-byte (sha256-hex block derivation) so the
  // final (repo, path, sha256(content)) set is computed independently of any
  // engine code path. splitmix64 needs mod-2^64 arithmetic: HUGEINT carries
  // add/mul (32-bit limb product), UBIGINT carries xor/shift. The inner
  // mix64(seed ^ mix64(salt)) is a per-salt CONSTANT precomputed here, so
  // each uniform draw is ONE variable mix64 (4 CTE stages).

  private val M64 = "18446744073709551616" // 2^64
  private def u64(l: Long): String = java.lang.Long.toUnsignedString(l)

  /** `(a * c) mod 2^64` over a HUGEINT expression via 32-bit limbs. */
  private def mul64(a: String, c: Long): String = {
    val cl = c & 0xffffffffL
    val ch = c >>> 32
    s"((($a % 4294967296) * $cl + ((($a // 4294967296) * $cl + ($a % 4294967296) * $ch) % 4294967296) * 4294967296) % $M64)"
  }

  /** `xor(x, x >>> sh)` (UBIGINT) of a HUGEINT column, back as HUGEINT. */
  private def xs(col: String, sh: Int): String =
    s"CAST(xor(CAST($col AS UBIGINT), CAST($col AS UBIGINT) >> $sh) AS HUGEINT)"

  /** CTE stages computing `h64(id, seed, salt)` as column `${p}_h` (UBIGINT):
    * mix64(id ^ K) with K = mix64(seed ^ mix64(salt)) folded to a constant.
    */
  private def h64Stages(p: String, prev: String, seed: Long, salt: Long): String = {
    import graft.genlog.EventGen.mix64
    val k = mix64(seed ^ mix64(salt))
    s"""${p}a AS (SELECT *, (CAST(xor(uid, CAST(${u64(k)} AS UBIGINT)) AS HUGEINT)
       |  + 11400714819323198485) % $M64 AS ${p}_x1 FROM $prev),
       |${p}b AS (SELECT *, ${mul64(xs(s"${p}_x1", 30), 0xbf58476d1ce4e5b9L)} AS ${p}_x2 FROM ${p}a),
       |${p}c AS (SELECT *, ${mul64(xs(s"${p}_x2", 27), 0x94d049bb133111ebL)} AS ${p}_x3 FROM ${p}b),
       |${p}d AS (SELECT *, xor(CAST(${p}_x3 AS UBIGINT), CAST(${p}_x3 AS UBIGINT) >> 31) AS ${p}_h FROM ${p}c)""".stripMargin
  }

  /** CTE stages computing a plain splitmix64 `mix64(in)` of UBIGINT
    * expression `in` as column `${p}_h` (UBIGINT) — the variable-input
    * sibling of [[h64Stages]] (which folds its inner mixes into a
    * constant); used where the oracle must re-derive mix64 chains whose
    * inputs are themselves SQL-computed (the shard-UUID mirror).
    */
  private def mix64Stages(p: String, prev: String, in: String): String =
    s"""${p}a AS (SELECT *, (CAST($in AS HUGEINT) + 11400714819323198485) % $M64 AS ${p}_x1 FROM $prev),
       |${p}b AS (SELECT *, ${mul64(xs(s"${p}_x1", 30), 0xbf58476d1ce4e5b9L)} AS ${p}_x2 FROM ${p}a),
       |${p}c AS (SELECT *, ${mul64(xs(s"${p}_x2", 27), 0x94d049bb133111ebL)} AS ${p}_x3 FROM ${p}b),
       |${p}d AS (SELECT *, xor(CAST(${p}_x3 AS UBIGINT), CAST(${p}_x3 AS UBIGINT) >> 31) AS ${p}_h FROM ${p}c)""".stripMargin

  /** Full independent mirror of the committed end-of-replay cursors
    * (`cdc_final_cursors`, seed 42 / 2 shards / 4000 catch-up events, no
    * copy phase): the per-shard binlog-writer UUID is re-derived
    * bit-for-bit (`ChangelogGen.shardUuid`'s two mix64 chains + printf
    * layout + 36-char truncation), the end GNO from the catch-up closed
    * form `(numEvents - i - 1) / numShards + 1`.
    */
  private val finalCursorsSql: String = {
    s"""WITH shards AS (SELECT CAST(range AS UBIGINT) AS i FROM range(0, 2)),
       |${mix64Stages("m1", "shards", "i")},
       |${mix64Stages("m2", "m1d", "xor(CAST(42 AS UBIGINT), m1_h)")},
       |${mix64Stages("m3", "m2d", "CAST(42 * 31 AS UBIGINT) + i")},
       |hv AS (SELECT i, CAST(m2_h & 4294967295 AS BIGINT) AS h1,
       |  CAST(m3_h & 4294967295 AS BIGINT) AS h2 FROM m3d),
       |uu AS (SELECT i, substr(printf('%08x-%04x-11eb-%04x-%08x%04x',
       |  h1, h2 & 65535, (h1 >> 8) & 65535, h2, h1), 1, 36) AS uuid FROM hv),
       |gno AS (SELECT i, uuid, (4000 - i - 1) // 2 + 1 AS rank FROM uu)
       |SELECT CASE i WHEN 0 THEN '-80' ELSE '80-' END AS shard,
       |  'ks' AS keyspace,
       |  'MySQL56/' || uuid || ':1-' || rank AS position,
       |  CAST(rank AS BIGINT) AS rank,
       |  false AS has_pk
       |FROM gno""".stripMargin
  }

  /** Shared CTE body deriving the replayed FINAL TABLE STATE entirely in
    * DuckDB — parameters mirror the queries' GenConfig (events=4000,
    * shards=2, repos=20 → 10 per shard, paths=10, zipf=2.0,
    * deleteRatio=0.05, seed=42, contentBlocks=8). Consumed by
    * `cdc_replay_final_state` (repo/path/sha) and `cdc_stream_evolution`
    * (same state streamed through the evolution trigger — the renamed
    * `language` column re-derived from the path's p_idx encoding).
    */
  private val replayBodySql: String = {
    val seed = 42L
    s"""WITH ids AS (SELECT CAST(range AS UBIGINT) AS uid, CAST(range AS HUGEINT) AS id
       |  FROM range(0, 4000)),
       |${h64Stages("s1", "ids", seed, 1)},
       |${h64Stages("s2", "s1d", seed, 2)},
       |${h64Stages("s3", "s2d", seed, 3)},
       |ev AS (SELECT id,
       |  (s1_h >> 11) / 9007199254740992.0 AS u1,
       |  (s2_h >> 11) / 9007199254740992.0 AS u2,
       |  (s3_h >> 11) / 9007199254740992.0 AS u3 FROM s3d),
       |row0 AS (SELECT id,
       |  CAST(id % 2 AS INT) + 2 * least(9, CAST(floor(10 * u1 * u1) AS INT)) AS repo_idx,
       |  least(9, CAST(floor(10 * u2) AS INT)) AS p_idx,
       |  u3 < 0.05 AS is_delete FROM ev),
       |keyed AS (SELECT id, printf('repo-%04d', repo_idx) AS repo,
       |  printf('src/dir%d/file%d.%s', p_idx % 7, p_idx,
       |    ['scala','go','py','rs','js'][p_idx % 5 + 1]) AS path,
       |  p_idx, is_delete FROM row0),
       |win AS (SELECT repo, path, arg_max(id, id) AS wid, max(p_idx) AS p_idx,
       |  arg_max(CAST(is_delete AS INT), id) AS wdel FROM keyed GROUP BY repo, path),
       |hashed AS (SELECT repo, path, wid, p_idx,
       |  sha256(repo || '|' || path || '|' || wid || '|$seed') AS h
       |  FROM win WHERE wdel = 0),
       |body AS (SELECT repo, path, p_idx,
       |  '// ' || repo || '/' || path || ' @v' || wid || chr(10) ||
       |  repeat('fn block_' || substr(h, 1, 12) || '() { return "' || substr(h, 13, 32) || '"; }' || chr(10),
       |    1 + CAST(CAST('0x' || substr(h, 1, 12) AS UBIGINT) % 8 AS INT)) AS content
       |  FROM hashed)""".stripMargin
  }

  private val replayFinalStateSql: String =
    s"$replayBodySql\nSELECT repo, path, sha256(content) AS sha FROM body"

  /** `cdc_stream_evolution`: the SAME final state, streamed through the
    * mid-stream schema_version bump — content parity proves the evolution
    * commits never disturbed the data, `language` (the renamed column) is
    * re-derived from the p_idx→language table, and the added column is
    * null everywhere (the source never delivered it).
    */
  private val streamEvolutionSql: String =
    s"""$replayBodySql
       |SELECT repo, path,
       |  ['scala','go','python','rust','javascript'][p_idx % 5 + 1] AS language,
       |  sha256(content) AS sha, true AS size_null
       |FROM body""".stripMargin

  val sql: Map[String, String] = Map(
    "cdc_replay_final_state" -> replayFinalStateSql,
    "cdc_stream_evolution" -> streamEvolutionSql,
    "cdc_final_cursors" -> finalCursorsSql,

    // A2 peek: heads from the copy/catch-up closed forms
    // (copyPerShard = ceil(1000/2), catchup(i) = (4000-i-1)//2+1),
    // endSeq caps first, non-primary tiers lag floored at 0
    "peek_offsets" ->
      """WITH g AS (
           SELECT s.scenario, s.end_seq, s.lag, s.nonprimary, i.shard_idx
           FROM (VALUES ('full', -1, 0, false), ('capped', 1500, 0, false),
                        ('replica_lag', -1, 300, true),
                        ('rdonly_capped_lag', 1500, 300, true))
                s(scenario, end_seq, lag, nonprimary),
                (VALUES (0),(1)) i(shard_idx)),
          t AS (SELECT *, (1000 + 2 - 1) // 2 + (4000 - shard_idx - 1) // 2 + 1 AS total
                FROM g),
          capped AS (SELECT *,
            CASE WHEN end_seq = -1 THEN total ELSE least(total, end_seq) END AS head0
            FROM t)
         SELECT scenario, shard_idx, CAST(0 AS BIGINT) AS initial_pos,
           CAST(CASE WHEN nonprimary THEN greatest(0, head0 - lag) ELSE head0 END
                AS BIGINT) AS head_pos
         FROM capped""",

    // A17 classification: engine validation non-retryable, everything
    // transient (incl. FOREIGN IAEs) retryable
    "retry_policy" ->
      """SELECT * FROM (VALUES
           (1, 'graft_validation', false),
           (2, 'wrapped_graft_validation', false),
           (3, 'transient_runtime', true),
           (4, 'illegal_state', true),
           (5, 'engine_require_iae', false),
           (6, 'engine_parse_numberformat', false),
           (7, 'foreign_iae', true),
           (8, 'wrapped_foreign_iae', true)) AS t(case_id, label, retryable)""",

    // A17 timeout_seconds spec surface (spec.json:83-90)
    "timeout_clamp" ->
      """SELECT * FROM (VALUES
           ('unset', CAST(-1 AS BIGINT), CAST(300 AS BIGINT)),
           ('below_min', CAST(10 AS BIGINT), CAST(300 AS BIGINT)),
           ('at_min', CAST(300 AS BIGINT), CAST(300 AS BIGINT)),
           ('above_min', CAST(900 AS BIGINT), CAST(900 AS BIGINT)))
         AS t(label, configured, effective)""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_price,
         count(*) AS n
         FROM lineitem GROUP BY 1, 2""",

    "q2_join_regions" ->
      """SELECT r_name,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue,
         count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1""",

    "q3_top_revenue" ->
      """SELECT l_orderkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2))))
              * 10000 AS BIGINT) AS revenue
         FROM lineitem GROUP BY 1
         ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",

    "q4_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
         GROUP BY 1""",

    "q5_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n, min(c_custkey) AS min_key
         FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY 1""",

    "q6_filter" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        CAST(l_discount AS DECIMAL(5,2))) * 10000 AS BIGINT) AS disc_revenue,
         count(*) AS n
         FROM lineitem WHERE l_quantity < 24 AND l_discount >= 0.05""",

    "q7_window" ->
      """SELECT o_custkey, o_orderkey, rn,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
               FROM orders) WHERE rn <= 3""",

    "q8_setops" ->
      """SELECT count(*) AS n_both, min(c_custkey) AS min_key, max(c_custkey) AS max_key
         FROM (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
               INTERSECT
               SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000)""",

    "q9_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps
         FROM lineitem GROUP BY 1""",

    "q10_scalar" ->
      """SELECT p_partkey, upper(substring(p_name, 1, 8)) AS name_prefix,
         length(p_type) AS type_len,
         CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS price_cents,
         p_partkey % 7 AS key_mod,
         concat_ws('#', p_brand, CAST(p_size AS VARCHAR)) AS brand_size
         FROM part""",

    "q11_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",

    "q12_events_windowed" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total
         FROM events GROUP BY 1, 2""",

    "q13_json" ->
      """SELECT k % 10 AS k_mod, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
         FROM (SELECT CAST(replace(replace(props, '{"k": ', ''), '}', '') AS BIGINT) AS k
               FROM events) GROUP BY 1""",

    "q14_asof_join" ->
      """WITH v AS (SELECT user_id, ts, max(event_id) AS view_id
                    FROM events WHERE event_type = 'view' GROUP BY 1, 2),
            p AS (SELECT user_id, ts, event_id AS purchase_id
                  FROM events WHERE event_type = 'purchase')
         SELECT p.purchase_id, p.user_id, v.view_id
         FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts""",

    "q15_range_join" ->
      """SELECT bucket, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total
         FROM events JOIN (VALUES (0.0, 25.0, 'low'), (25.0, 75.0, 'mid'),
           (75.0, 1000000000.0, 'high')) AS b(lo, hi, bucket)
           ON value >= lo AND value < hi
         WHERE value >= 0 GROUP BY 1""",

    "cdc_lww_dedup" ->
      """SELECT l_orderkey, last_part, last_line, last_qty FROM (
           SELECT l_orderkey, l_partkey AS last_part, l_linenumber AS last_line,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS last_qty,
             row_number() OVER (PARTITION BY l_orderkey
               ORDER BY l_shipdate DESC, l_linenumber DESC, l_partkey DESC, l_quantity DESC) AS rn
           FROM lineitem) WHERE rn = 1""",

    "cdc_merge_upsert" ->
      """WITH base AS (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS base_price
                       FROM orders WHERE o_orderkey % 3 <> 0),
            updates AS (SELECT o_orderkey,
                          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DECIMAL(18,2)) AS upd_price
                        FROM orders WHERE o_orderkey % 2 = 0)
         SELECT o_orderkey, CAST(COALESCE(upd_price, base_price) * 100 AS BIGINT) AS final_price,
           CASE WHEN upd_price IS NOT NULL AND base_price IS NOT NULL THEN 'updated'
                WHEN upd_price IS NOT NULL THEN 'inserted' ELSE 'kept' END AS merge_op
         FROM base FULL OUTER JOIN updates USING (o_orderkey)""",

    "cdc_delete_apply" ->
      """SELECT c_mktsegment, count(*) AS n, max(c_custkey) AS max_key
         FROM customer WHERE c_custkey % 7 <> 0 GROUP BY 1""",

    "cdc_snapshot_chunks" ->
      """SELECT chunk, count(*) AS n, min(o_orderkey) AS from_key, max(o_orderkey) AS to_key
         FROM (SELECT o_orderkey, ntile(16) OVER (ORDER BY o_orderkey) AS chunk FROM orders)
         GROUP BY 1""",

    "cdc_stop_position" ->
      """WITH stops AS (SELECT event_type, max(event_id) AS stop_id
                        FROM events WHERE value < 50 GROUP BY 1)
         SELECT e.event_type, count(*) AS n_synced, max(e.event_id) AS last_id
         FROM events e JOIN stops s
           ON e.event_type = s.event_type AND e.event_id <= s.stop_id
         GROUP BY 1""",

    // full relational mirror of the wire-typed ingest: same deterministic
    // generation from customer, LWW = max version per key (rank 2 > 1),
    // deletes drop k%11=0 keys, then every parseValue rule — enum index →
    // label (0 → '', out-of-range → original), set bitmask decode (zero
    // picked bits → original), tinyint(1) → bool, datetime → ISO (zero-date
    // → epoch), TIMESTAMP passthrough, decimal leading-zero fix
    "cdc_normalized_ingest" ->
      """WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
                       WHERE c_custkey <= 600),
          w AS (SELECT k, (k + 2) % 6 AS st_idx, (k * 7 + 2) % 33 AS mask,
                  k % 10 AS cd, (k + 2) % 10 AS ud
                FROM base WHERE k % 11 <> 0)
         SELECT
           'r' || lpad(CAST(k % 37 AS VARCHAR), 2, '0') AS repo,
           'p' || CAST(k AS VARCHAR) AS path,
           CASE st_idx WHEN 0 THEN '' WHEN 1 THEN 'active' WHEN 2 THEN 'inactive'
                WHEN 3 THEN 'archived' ELSE CAST(st_idx AS VARCHAR) END AS status,
           CASE WHEN (mask & 31) = 0 THEN CAST(mask AS VARCHAR)
                ELSE ltrim(
                  (CASE WHEN mask & 1 = 1 THEN ',San Francisco' ELSE '' END) ||
                  (CASE WHEN mask & 2 = 2 THEN ',New York' ELSE '' END) ||
                  (CASE WHEN mask & 4 = 4 THEN ',London' ELSE '' END) ||
                  (CASE WHEN mask & 8 = 8 THEN ',San Jose' ELSE '' END) ||
                  (CASE WHEN mask & 16 = 16 THEN ',Oakland' ELSE '' END), ',')
           END AS locations,
           (k % 3) <> 0 AS verified,
           CASE WHEN cd = 0 THEN '1970-01-01T00:00:00.000000'
                ELSE '2021-03-04T05:06:0' || CAST(cd AS VARCHAR) || '.000000'
           END AS created_iso,
           '2025-02-14 08:08:0' || CAST(ud AS VARCHAR) AS updated_wire,
           CASE k % 4 WHEN 0 THEN 33 WHEN 1 THEN -77 WHEN 2 THEN 1250 ELSE -25
           END AS balance_cents,
           k % 900 + 200 AS stars
         FROM w""",

    // out-of-range index ('9') and zero SET mask ('0') return the ORIGINAL
    // value (mapEnumValue/mapSetValue fallthroughs, types.go:334-386)
    "norm_enum" ->
      """SELECT * FROM (VALUES ('0',''),('1','active'),('2','inactive'),('3','archived'),
         ('9','9'),('active','active'),('x','x')) AS t(v, label)""",

    "norm_set" ->
      """SELECT * FROM (VALUES ('0','0'),('1','San Francisco'),('3','San Francisco,New York'),
         ('24','San Jose,Oakland'),
         ('31','San Francisco,New York,London,San Jose,Oakland'),
         ('London','London'),('x','x')) AS t(v, labels)""",

    // as_bool/opted_out = the do_not_treat_tiny_int_as_boolean toggle
    // (planetscale_connection.go:30-32): opted out keeps the raw integer
    "norm_tinyint" ->
      """SELECT * FROM (VALUES (CAST(0 AS BIGINT), false, 'false', '0'),
         (1, true, 'true', '1'),(2, true, 'true', '2'),(-1, true, 'true', '-1'))
         AS t(v, b, as_bool, opted_out)""",

    // '0000-00-00 11:22:33' is NOT an exact zero-date: the reference's
    // time.Parse fails (month 0) and the value passes through UNCHANGED
    // (types.go:309-315 matches exactly, never by prefix); its date-part
    // substring '0000-00-00' still IS a zero-date → epoch
    "norm_datetime" ->
      """SELECT * FROM (VALUES
         ('2021-03-04 05:06:07','2021-03-04T05:06:07.000000','2021-03-04'),
         ('0000-00-00 00:00:00','1970-01-01T00:00:00.000000','1970-01-01'),
         ('0000-00-00 11:22:33','0000-00-00 11:22:33','1970-01-01'),
         ('0000-00-00','1970-01-01T00:00:00.000000','1970-01-01'),
         ('1999-12-31 23:59:59','1999-12-31T23:59:59.000000','1999-12-31')) AS t(v, iso, d)""",

    // TIMESTAMP renders WITH the +00:00 offset; TIME takes the default branch
    // (datetime layout, bare times pass through) — types_test.go:158-198
    "norm_timestamp_tz" ->
      """SELECT * FROM (VALUES
         ('2025-02-14 08:08:08','2025-02-14T08:08:08.000000+00:00'),
         ('0000-00-00 00:00:00','1970-01-01T00:00:00.000000+00:00'),
         ('0000-00-00 11:22:33','0000-00-00 11:22:33'),
         ('1999-12-31 23:59:59','1999-12-31T23:59:59.000000+00:00'),
         ('not-a-time','not-a-time')) AS t(v, iso_tz)""",

    "norm_time" ->
      """SELECT * FROM (VALUES
         ('2025-02-14 08:08:08','2025-02-14T08:08:08.000000+00:00'),
         ('08:08:08','08:08:08'),
         ('0000-00-00 00:00:00','1970-01-01T00:00:00.000000+00:00')) AS t(v, t)""",

    "norm_decimal" ->
      """SELECT * FROM (VALUES ('.33','0.33'),('-.77','-0.77'),('0.5','0.5'),
         ('12.34','12.34'),('-0.1','-0.1')) AS t(v, fixed)""",

    // cases 6-8: blank positions never after/equal (database.go:617-652 guards)
    "gtid_order" ->
      """SELECT * FROM (VALUES (1,true,false),(2,false,false),(3,true,false),
         (4,false,true),(5,false,true),(6,false,false),(7,false,false),
         (8,false,false)) AS t(case_id, x_after_y, x_eq_y)""",

    "catalog_gc_filter" ->
      """SELECT * FROM (VALUES ('users'),('orders'),('products')) AS t(table_name)""",

    // expected rows hand-derived from the reference's getJsonSchemaType test
    // table (planetscale_edge_database_test.go:360-503) + SURVEY §1.2 Spark types
    "catalog_type_map" ->
      """SELECT * FROM (VALUES
         (1,'int(11)',false,'number','integer','','BIGINT'),
         (2,'smallint(4)',false,'number','integer','','BIGINT'),
         (3,'mediumint(8)',false,'number','integer','','BIGINT'),
         (4,'tinyint',true,'number','integer','','BIGINT'),
         (5,'tinyint(1)',true,'boolean','','','BOOLEAN'),
         (6,'tinyint(1) unsigned',true,'boolean','','','BOOLEAN'),
         (7,'tinyint(1)',false,'number','integer','','BIGINT'),
         (8,'tinyint(1) unsigned',false,'number','integer','','BIGINT'),
         (9,'bigint(16)',false,'number','integer','','BIGINT'),
         (10,'bigint unsigned',false,'number','integer','','BIGINT'),
         (11,'bigint zerofill',false,'number','integer','','BIGINT'),
         (12,'datetime',false,'string','timestamp_without_timezone','date-time','TIMESTAMP_NTZ'),
         (13,'datetime(6)',false,'string','timestamp_without_timezone','date-time','TIMESTAMP_NTZ'),
         (14,'timestamp',false,'string','timestamp_with_timezone','date-time','TIMESTAMP'),
         (15,'timestamp(6)',false,'string','timestamp_with_timezone','date-time','TIMESTAMP'),
         (16,'time',false,'string','time_with_timezone','time','STRING'),
         (17,'time(6)',false,'string','time_with_timezone','time','STRING'),
         (18,'date',false,'string','date','date','DATE'),
         (19,'text',false,'string','','','STRING'),
         (20,'varchar(256)',false,'string','','','STRING'),
         (21,'varchar(256)',false,'null,string','','','STRING'),
         (22,'decimal(12,5)',false,'number','','','DECIMAL(12,5)'),
         (23,'double',false,'number','','','DOUBLE'),
         (24,'float(30)',false,'number','','','DOUBLE')
         ) AS t(case_id, mysql_type, treat_bool, json_type, airbyte_type, custom_format, spark_type)""",

    // expected resolution hand-derived from read.go:151-184 / read_test.go:15-115
    "catalog_sync_modes" ->
      """SELECT * FROM (VALUES
         (1,'incremental',true,true,'state'),
         (2,'incremental',true,false,'state'),
         (3,'incremental',false,true,'starting_gtid'),
         (4,'incremental',false,false,'blank'),
         (5,'full_refresh',true,true,'starting_gtid'),
         (6,'full_refresh',true,false,'blank'),
         (7,'append',true,false,'blank'),
         (8,'full_refresh',false,true,'starting_gtid')
         ) AS t(case_id, sync_mode, has_state, has_starting_gtid, effective)""",

    // rename-vs-add disambiguation: alias hit on an old name → RENAME (field
    // id preserved); alias miss ("remark" never existed) → ADD; ["null",T]
    // union → nullable T
    "catalog_evolution" ->
      """SELECT * FROM (VALUES
         ('repo','kept',''),('path','kept',''),
         ('body','renamed','content'),('size','kept',''),
         ('stars','added','INT'),('note','added','STRING')
         ) AS t(field, disposition, detail)""",

    "shard_enum" ->
      """SELECT * FROM (VALUES ('-20',true),('20-40',false),('40-60',false),('60-80',true),
         ('80-a0',false),('a0-c0',false),('c0-e0',false),('e0-',true)) AS t(shard, selected)""",

    // configured " -20 ,60-80,,e0-," → trim-after-skip-blank selects
    // indexes {0,3,7} of the 8 live shards (planetscale_connection.go:66-83)
    "shard_subset" ->
      """SELECT * FROM (VALUES ('-20',0,true),('20-40',1,false),('40-60',2,false),
         ('60-80',3,true),('80-a0',4,false),('a0-c0',5,false),('c0-e0',6,false),
         ('e0-',7,true)) AS t(shard, idx, selected)""",

    // A14: the engine's serialized cursor bytes (compact JSON → base64,
    // field order keyspace/shard/position/last_known_pk) reconstructed
    // INDEPENDENTLY via string concat + to_base64, plus the copy-phase
    // resume rule (LastKnownPk clears the GTID unless
    // use_gtid_with_table_pks — planetscale_edge_database.go:312-314)
    "cursor_roundtrip" ->
      """WITH cases(case_id, keyspace, shard, position, repo, path) AS (VALUES
           (1, 'ks', '-80', 'MySQL56/16b1ab85-3bbb-11ed-91a4-fd546a9a111d:1-5', NULL, NULL),
           (2, 'ks', '80-', '', 'repo-7', 'src/pkg/a.go'),
           (3, 'commerce', '-', 'MySQL56/aaaa:1-100,bbbb:3-9', 'r', 'p'),
           (4, 'sakila', 'c0-', 'MySQL56/dead:1-2', NULL, NULL),
           (5, 'ks', '40-80', '', NULL, NULL))
         SELECT case_id, keyspace, shard, position,
           repo IS NOT NULL AS has_pk,
           to_base64(encode('{"keyspace":"' || keyspace || '","shard":"' || shard ||
             '","position":"' || position || '"' ||
             CASE WHEN repo IS NULL THEN ''
                  ELSE ',"last_known_pk":{"repo":"' || repo || '","path":"' || path || '"}' END
             || '}')) AS serialized,
           true AS roundtrip_ok,
           CASE WHEN repo IS NOT NULL THEN '' ELSE position END AS resume_position,
           repo IS NOT NULL AS resume_keeps_pk,
           position AS resume_position_with_pks
         FROM cases""",

    // A19: rdonly > replica > primary precedence; non-primary tiers serve a
    // lagged head floored at 0; end_seq (-1 = uncapped) caps the true head
    // of 50 first (planetscale_connection.go:43-48)
    "tablet_routing" ->
      """WITH grid AS (
           SELECT r.use_replica, d.use_rdonly, l.lag_events, e.end_seq
           FROM (VALUES (false),(true)) r(use_replica),
                (VALUES (false),(true)) d(use_rdonly),
                (VALUES (CAST(0 AS BIGINT)),(CAST(5 AS BIGINT)),(CAST(100 AS BIGINT))) l(lag_events),
                (VALUES (CAST(-1 AS BIGINT)),(CAST(30 AS BIGINT))) e(end_seq))
         SELECT use_replica, use_rdonly, lag_events, end_seq,
           CASE WHEN use_rdonly THEN 'rdonly' WHEN use_replica THEN 'replica'
                ELSE 'primary' END AS tablet_type,
           CASE WHEN NOT use_rdonly AND NOT use_replica
                THEN least(50, CASE WHEN end_seq = -1 THEN 50 ELSE end_seq END)
                ELSE greatest(0, least(50, CASE WHEN end_seq = -1 THEN 50 ELSE end_seq END) - lag_events)
           END AS head
         FROM grid""",

    "dedup_exact" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS copies
         FROM documents GROUP BY 1""",

    "text_tokens" ->
      """SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS tokens,
         len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS bpe_tokens,
         length(text) AS chars
         FROM documents""",

    "text_quality" -> qualityOracle,

    "text_langid" -> langCase,

    "dedup_ngram_jaccard" -> ngramJaccardOracle,
    "dedup_minhash" -> minhashOracle,
    "dedup_simhash" -> simhashOracle,
    "sim_knn_lsh" -> lshOracle,

    // composed training-set pipeline: langid gate + quality gate + exact-
    // dedup canonical (min doc_id per md5) + token count — each leg reuses
    // the SAME mirror the standalone oracle uses
    "pipeline_training_set" ->
      s"""WITH l AS ($langCase),
          q AS ($qualityOracle),
          tk AS (SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '${"\\"}s+')) END AS tokens
                 FROM documents),
          c AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
         SELECT l.doc_id, l.predicted, q.quality, tk.tokens
         FROM l JOIN q USING (doc_id) JOIN tk USING (doc_id) JOIN c USING (doc_id)
         WHERE l.predicted = 'en' AND q.quality >= 500""",

    "text_fingerprint" ->
      """SELECT doc_id, true AS fp_in_range, true AS fp_window_monotone
         FROM documents""",

    // brute-force cosine≥0.95 over corpus + perturbed plants; LSH recall on
    // this corpus is exhaustive (see SparkEntry.dedupEmbedding)
    "dedup_embedding" ->
      """WITH base AS (SELECT vec_id AS id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
            FROM embeddings),
          corpus AS (SELECT id, vec FROM base
                     UNION ALL
                     SELECT id + 1000000 AS id,
                            list_concat([vec[1] + 0.02], vec[2:]) AS vec
                     FROM base)
         SELECT a.id AS a_id, b.id AS b_id
         FROM corpus a JOIN corpus b ON a.id < b.id
         WHERE list_cosine_similarity(a.vec, b.vec) >= 0.95""",

    "sim_knn_cosine" ->
      """SELECT query_id, neighbor_id, rank FROM (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id ASC) AS rank
           FROM embeddings q, embeddings c
           WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id)
         WHERE rank <= 5""",

    // REAL-decode mirror: the engine encodes the deterministic image for
    // doc_id (w = 8 + id%9, h = 8 + (id/9)%9, gray(x,y) = (7x+13y+id)%256)
    // as genuine PNG bytes and decodes them with javax.imageio; this SQL
    // re-derives every decoded stat in closed form — equality proves the
    // round trip went through a real codec (a faked decode cannot
    // reproduce the per-pixel sum of an image it never parsed)
    "multimodal_features" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 9) % 9 AS h
                    FROM documents),
          px AS (SELECT doc_id, w, h,
                   CAST(sum((x * 7 + y * 13 + doc_id) % 256) AS BIGINT) AS pix_sum
                 FROM d, LATERAL (SELECT unnest(range(0, w)) AS x) ux,
                         LATERAL (SELECT unnest(range(0, h)) AS y) uy
                 GROUP BY doc_id, w, h)
         SELECT doc_id, w AS width, h AS height, 'png' AS format, pix_sum,
           CASE WHEN w <= 12 AND h <= 12 THEN w WHEN w >= h THEN 12
                ELSE greatest((w * 12) // h, 1) END AS resized_w,
           CASE WHEN w <= 12 AND h <= 12 THEN h WHEN w >= h THEN greatest((h * 12) // w, 1)
                ELSE 12 END AS resized_h
         FROM px""",

    // full IVF mirror: same seed centroids, cell assignment, nprobe probing,
    // cosine rank — algorithm parity, not a recall bound
    "sim_knn_ivf" ->
      """WITH emb AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
          cent AS (SELECT id AS cent_id, vec AS cvec FROM emb WHERE id < 16),
          corpus_cells AS (
            SELECT id, cell FROM (
              SELECT e.id, c.cent_id AS cell,
                row_number() OVER (PARTITION BY e.id
                  ORDER BY list_cosine_similarity(e.vec, c.cvec) DESC, c.cent_id ASC) AS rn
              FROM emb e CROSS JOIN cent c) WHERE rn = 1),
          query_cells AS (
            SELECT id, cell FROM (
              SELECT e.id, c.cent_id AS cell,
                row_number() OVER (PARTITION BY e.id
                  ORDER BY list_cosine_similarity(e.vec, c.cvec) DESC, c.cent_id ASC) AS rn
              FROM emb e CROSS JOIN cent c WHERE e.id < 8) WHERE rn <= 4),
          cand AS (SELECT q.id AS query_id, x.id AS neighbor_id
                   FROM query_cells q JOIN corpus_cells x USING (cell)
                   WHERE x.id <> q.id)
         SELECT query_id, neighbor_id, rank FROM (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY list_cosine_similarity(a.vec, b.vec) DESC, neighbor_id ASC) AS rank
           FROM cand JOIN emb a ON a.id = query_id JOIN emb b ON b.id = neighbor_id)
         WHERE rank <= 5""",

    // container of 1 + id%5 length-prefixed PNG frames; every 2nd kept and
    // really decoded (frame i's image seed = id*31 + i)
    "multimodal_frames" ->
      """WITH docs AS (SELECT doc_id, 1 + doc_id % 5 AS n FROM documents),
          frames AS (SELECT doc_id, n, f, doc_id * 31 + f AS s
                     FROM docs, LATERAL (SELECT unnest(range(0, n, 2)) AS f) u),
          dims AS (SELECT doc_id, f, n, s, 8 + s % 9 AS w, 8 + (s // 9) % 9 AS h
                   FROM frames),
          px AS (SELECT doc_id, f, n, w, h,
                   CAST(sum((x * 7 + y * 13 + s) % 256) AS BIGINT) AS pix_sum
                 FROM dims, LATERAL (SELECT unnest(range(0, w)) AS x) ux,
                         LATERAL (SELECT unnest(range(0, h)) AS y) uy
                 GROUP BY doc_id, f, n, w, h)
         SELECT doc_id, f AS frame_idx, n AS n_frames, w AS frame_w, h AS frame_h,
                pix_sum
         FROM px"""
  )
}
