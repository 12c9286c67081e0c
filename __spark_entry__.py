"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the PySpark re-expression of
the reference's documented example query,
``docs/exemplos/query_sqlite.md:10-73``) at sf0.001.

``queries()`` exposes every implemented operator from SURVEY.md §2 as a
named (spark, sf_dir) → DataFrame callable; ``oracle_sql()`` gives the
DuckDB twin for each SQL-expressible one. Column names/aliases match
pairwise — the driver hash-compares values after sorting columns by
name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rfb_cnpj_etl_spark.operators.dedup import HASH_P31, affine_params
from rfb_cnpj_etl_spark.operators.similarity import deterministic_planes
from rfb_cnpj_etl_spark.plans import queries as Q
from rfb_cnpj_etl_spark.schema import CNPJ_SCHEMAS
from rfb_cnpj_etl_spark.sources.changelog import events_changelog_sql
from rfb_cnpj_etl_spark.sources.cnpj_fixture import FIXTURE_DIR, ensure_cnpj_fixture
from rfb_cnpj_etl_spark.sources.jsonl import (
    FIXTURE_DIR as JSONL_DIR,
    ensure_jsonl_fixture,
)

# The file-format fixtures must exist before EITHER engine runs (the
# driver may execute the DuckDB oracle first); writes are idempotent.
ensure_cnpj_fixture()
ensure_jsonl_fixture()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.flagship_report(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # CDC family (SURVEY §2.4 M1/M2 + replay semantics)
        "cdc_final_state": Q.cdc_final_state,
        "cdc_mor_replay": Q.cdc_mor_replay,
        "cdc_change_feed": Q.cdc_change_feed,
        "cdc_time_travel": Q.cdc_time_travel,
        "cdc_checkpoint_travel": Q.cdc_checkpoint_travel,
        "cdc_incremental_agg": Q.cdc_incremental_agg,
        "cdc_first_writer_wins": Q.cdc_first_writer_wins,
        "cdc_prioritized_dedup": Q.cdc_prioritized_dedup,
        "cdc_repo_stats": Q.cdc_repo_stats,
        # Relational family (SURVEY §2.5 Q1–Q10)
        "q1_pricing_summary": Q.q1_pricing_summary,
        "flagship_report": Q.flagship_report,
        "flagship_full": Q.flagship_full,
        "q3_group_concat": Q.q3_group_concat,
        "q4_case_decode": Q.q4_case_decode,
        "q6_date_format": Q.q6_date_format,
        "q7_filter_topk": Q.q7_filter_topk,
        "q9_union_parts": Q.q9_union_parts,
        "fk_orphan_audit": Q.fk_orphan_audit,
        "semi_join_orders": Q.semi_join_orders,
        "window_running_sum": Q.window_running_sum,
        "topk_per_group": Q.topk_per_group,
        "explode_words": Q.explode_words,
        # Normalization family (SURVEY §2.3 T1–T5, §2.4 M4–M5)
        # Patch-pass family (SURVEY §2.4 M3/M6)
        "static_dim_upsert": Q.static_dim_upsert,
        "orphan_delete": Q.orphan_delete,
        "norm_dates": Q.norm_dates,
        "norm_numeric_br": Q.norm_numeric_br,
        "sanitize_strings": Q.sanitize_strings,
        "cnpj_cp1252_roundtrip": Q.cnpj_cp1252_roundtrip,
        "cnpj_etl_e2e": Q.cnpj_etl_e2e,
        "jsonl_doc_stats": Q.jsonl_doc_stats,
        "zero_pad_codes": Q.zero_pad_codes,
        "content_hashes": Q.content_hashes,
        # Training-data family (documents/embeddings)
        "dedup_exact_docs": Q.dedup_exact_docs,
        "doc_token_stats": Q.doc_token_stats,
        "doc_quality": Q.doc_quality,
        "ngram_jaccard_dups": Q.ngram_jaccard_dups,
        "minhash_dups": Q.minhash_dups,
        "near_dup_clusters": Q.near_dup_clusters,
        "dedup_canonical_docs": Q.dedup_canonical_docs,
        "minhash_incremental": Q.minhash_incremental,
        "simhash_dups": Q.simhash_dups,
        "doc_text_features": Q.doc_text_features,
        "doc_fingerprints": Q.doc_fingerprints,
        "embedding_near_dups": Q.embedding_near_dups,
        "embedding_dup_clusters": Q.embedding_dup_clusters,
        "embedding_near_dups_exact": Q.embedding_near_dups_exact,
        "ann_cosine_topk": Q.ann_cosine_topk,
        "ann_lsh_topk": Q.ann_lsh_topk,
        "ann_ivf_topk": Q.ann_ivf_topk,
        # Multimodal family (binary payloads via mapInPandas)
        "media_features": Q.media_features,
        "media_frame_plan": Q.media_frame_plan,
    }


_LOG = events_changelog_sql("events")

_TOKS = (
    "SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t "
    "FROM documents"
)

_SHINGLES = f"""
    WITH toks AS ({_TOKS}),
    sh AS (
      SELECT doc_id AS id,
             unnest(list_distinct(
               CASE WHEN len(t) >= 3
                    THEN [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
                    ELSE [array_to_string(t, ' ')] END)) AS sh
      FROM toks
    )
"""


# ---------------------------------------------------------------------------
# Cross-engine literals shared with the Spark plans: the md5-affine
# minhash lanes, the 60-bit simhash base, and the LSH hyperplanes are
# generated ONCE here and inlined into both engines' expressions, so the
# oracle reproduces the Spark values bit-for-bit.
# ---------------------------------------------------------------------------

_MH_NUM_HASHES, _MH_BANDS = 16, 4
_MH_PARAMS = affine_params(_MH_NUM_HASHES)
_LSH_PLANES = deterministic_planes(64, 3, 42)
_SIMHASH_BITS, _SIMHASH_BLOCKS = 60, 4


def _vec_sql(vec: list[float]) -> str:
    return "[" + ", ".join(repr(float(x)) for x in vec) + "]"


def _lsh_bucket_sql(v: str) -> str:
    """Random-hyperplane bucket id of a DOUBLE[] column — the SQL twin
    of similarity._bucket_of over the same plane literals."""
    return " + ".join(
        f"(CASE WHEN list_inner_product({v}, {_vec_sql(p)}) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(_LSH_PLANES)
    )


def _cos_sql(a: str, b: str) -> str:
    """cosine(a, b) spelled exactly like similarity.cosine (dot/norms in
    double, left-to-right sums) for bit-parity on unrounded comparisons."""
    return (
        f"(list_inner_product({a}, {b}) / (sqrt(list_inner_product({a}, {a}))"
        f" * sqrt(list_inner_product({b}, {b}))))"
    )


def _minhash_sig_sql() -> str:
    """sig CTE body: per-doc minima of the md5-affine lanes over 3-gram
    shingles (twin of dedup.minhash_signatures(hash_family='md5'))."""
    base = f"(CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) % {HASH_P31})"
    lanes = ",\n                     ".join(
        f"min(({a} * {base} + {b}) % {HASH_P31}) AS h{i}"
        for i, (a, b) in enumerate(_MH_PARAMS)
    )
    return f"SELECT id, {lanes} FROM sh GROUP BY id"


def _minhash_band_sql() -> str:
    """banded CTE: one (id, band, bucket-string) row per band — the
    bucket is the comma-joined lane values, matching the md5-family band
    key in dedup.minhash_lsh_pairs."""
    r = _MH_NUM_HASHES // _MH_BANDS
    selects = []
    for b in range(_MH_BANDS):
        key = " || ',' || ".join(
            f"CAST(h{b * r + j} AS VARCHAR)" for j in range(r)
        )
        selects.append(f"SELECT id, {b} AS band, {key} AS bucket FROM sig")
    return "\n              UNION ALL ".join(selects)


def _minhash_est_sql() -> str:
    agree = " + ".join(
        f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)"
        for i in range(_MH_NUM_HASHES)
    )
    return f"({agree}) / {float(_MH_NUM_HASHES)}"


def _simhash_votes_sql() -> str:
    sums = ",\n                     ".join(
        f"sum(CASE WHEN (b >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(_SIMHASH_BITS)
    )
    return f"SELECT id, {sums} FROM h GROUP BY id"


def _simhash_pack_sql() -> str:
    bits = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN CAST(1 AS BIGINT) << {i}"
        f" ELSE CAST(0 AS BIGINT) END)"
        for i in range(_SIMHASH_BITS)
    )
    return f"SELECT id, {bits} AS sh FROM votes"


def _simhash_block_sql() -> str:
    width = _SIMHASH_BITS // _SIMHASH_BLOCKS
    mask = (1 << width) - 1
    selects = [
        f"SELECT id, sh, {b} AS blk, (sh >> {b * width}) & {mask} AS val FROM sk"
        for b in range(_SIMHASH_BLOCKS)
    ]
    return "\n              UNION ALL ".join(selects)


def _cnpj_csv_cols(table: str) -> str:
    """DuckDB read_csv ``columns`` literal: the positional all-VARCHAR
    binding of schema.CNPJ_SCHEMAS (same source of truth as the Spark
    scan)."""
    names = [f.name for f in CNPJ_SCHEMAS[table].fields]
    return "{" + ", ".join(f"'{n}': 'VARCHAR'" for n in names) + "}"


def _sql_sanitize(col: str) -> str:
    """T1 twin: trim + NUL-strip."""
    return f"trim(replace({col}, chr(0), ''))"


def _sql_date(col: str) -> str:
    """T4 twin: sentinel → NULL, else try-parse YYYYMMDD (invalid → NULL)."""
    return (
        f"CASE WHEN {col} IS NULL OR trim({col}) IN ('00000000', '', '0')"
        f" THEN NULL ELSE CAST(try_strptime({col}, '%Y%m%d') AS DATE) END"
    )


def _sql_numeric_br(col: str) -> str:
    """T3 twin: BR-decimal rewrite guarded exactly like the reference
    (comma present + all-digits after removing '.' and ','), DOUBLE out."""
    digits = f"replace(replace({col}, '.', ''), ',', '')"
    rewritten = f"replace(replace({col}, '.', ''), ',', '.')"
    return (
        f"CASE WHEN {col} IS NULL THEN NULL"
        f" WHEN contains({col}, ',') AND regexp_matches({digits}, '^[0-9]+$')"
        f" THEN CAST(CAST({rewritten} AS DECIMAL(16,2)) AS DOUBLE)"
        f" ELSE CAST(TRY_CAST({col} AS DECIMAL(16,2)) AS DOUBLE) END"
    )


#: doc_text_features SQL is reused (superset) by doc_quality.
_DOC_FEATURES_SQL = r"""
    WITH base AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(text, '\s+'),
                         x -> len(x) > 0) AS toks,
             length(text) AS n_chars,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
             len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe
      FROM documents
    ),
    hits AS (
      SELECT doc_id, toks, n_chars, alpha, n_bpe,
             list_transform(toks, x -> lower(x)) AS lt
      FROM base
    ),
    scored AS (
      SELECT doc_id, toks, n_chars, alpha, n_bpe,
        len(list_filter(lt, x -> list_contains(
          ['der','die','und','das','von','zu','mit','den','ist','ein'], x))) AS h_de,
        len(list_filter(lt, x -> list_contains(
          ['the','and','of','to','in','is','that','it','for','with'], x))) AS h_en,
        len(list_filter(lt, x -> list_contains(
          ['el','la','de','que','y','en','un','por','con','los'], x))) AS h_es,
        len(list_filter(lt, x -> list_contains(
          ['le','la','de','et','les','des','un','une','dans','pour'], x))) AS h_fr,
        len(list_filter(lt, x -> list_contains(
          ['o','a','de','que','e','do','da','em','um','para'], x))) AS h_pt
      FROM hits
    ),
    feats AS (
      SELECT doc_id,
        len(toks) AS n_tokens,
        n_bpe AS n_bpe_tokens,
        greatest(h_de, h_en, h_es, h_fr, h_pt) AS m,
        h_de, h_en, h_es, h_fr, h_pt,
        CASE WHEN n_chars > 0 THEN alpha / n_chars ELSE 0.0 END AS alpha_ratio,
        CASE WHEN len(toks) > 0
             THEN len(list_distinct(toks)) / len(toks) ELSE 0.0 END AS distinct_ratio,
        CASE WHEN len(toks) > 0 AND n_chars / len(toks) >= 3
                  AND n_chars / len(toks) <= 12
             THEN 1.0 ELSE 0.5 END AS wl_ok
      FROM scored
    )
    SELECT doc_id, n_tokens, n_bpe_tokens,
           CASE WHEN m = 0 THEN 'und'
                WHEN h_pt = m THEN 'pt'
                WHEN h_fr = m THEN 'fr'
                WHEN h_es = m THEN 'es'
                WHEN h_en = m THEN 'en'
                ELSE 'de' END AS lang_pred,
           round((alpha_ratio + distinct_ratio + wl_ok) / 3.0, 6) AS quality
    FROM feats
"""


def _minhash_closure_sql() -> str:
    """Shared CTE chain for the clustering oracles: md5-affine MinHash
    pairs (threshold 0.5) → symmetrized edges → recursive transitive
    closure. Callers prepend the RECURSIVE-marked shingle CTE and
    select from ``closure`` — one definition, so the two closure
    oracles can never silently diverge from each other."""
    return f"""sig AS ({_minhash_sig_sql()}),
            banded AS (
              {_minhash_band_sql()}
            ),
            cand AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM banded a
              JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                           AND a.id < b.id
            ),
            est AS (
              SELECT c.id_a, c.id_b, {_minhash_est_sql()} AS est_jaccard
              FROM cand c
              JOIN sig sa ON sa.id = c.id_a
              JOIN sig sb ON sb.id = c.id_b
            ),
            pairs AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5),
            e AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION
              SELECT id_b, id_a FROM pairs
            ),
            closure(node, r) AS (
              SELECT src, dst FROM e
              UNION
              SELECT c.node, e.dst FROM closure c JOIN e ON e.src = c.r
            )"""


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_final_state": f"""
            WITH log AS ({_LOG}),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
              FROM log
            )
            SELECT repo, path, "commit", lang, content, lsn,
                   sha256(content) AS content_sha256
            FROM ranked WHERE rn = 1 AND op <> 'delete'
        """,
        # the engine replay (bulk COW window + merge-on-read churn tail
        # through the bucketed state table) must land on the SAME final
        # state as the plain LWW dedup — the fold is the thing under test
        "cdc_mor_replay": f"""
            WITH log AS ({_LOG}),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
              FROM log
            )
            SELECT repo, path, "commit", lang, content, lsn,
                   sha256(content) AS content_sha256
            FROM ranked WHERE rn = 1 AND op <> 'delete'
        """,
        # CDC-out: the engine's published change feed (4 absolute-LSN
        # windows) must equal the SQL window diff — per (key, window)
        # LWW winner, classified against the previous surviving winner
        # via lag(). Window width = ceil((max_lsn+1)/4) on BOTH sides.
        "cdc_change_feed": f"""
            WITH log AS ({_LOG}),
            p AS (SELECT (MAX(lsn) + 4) // 4 AS bs FROM log),
            wl AS (
              SELECT l.*, CAST(l.lsn // (SELECT bs FROM p) AS BIGINT) AS wid
              FROM log l
            ),
            win AS (  -- per (key, window) LWW winner (lsn is unique)
              SELECT wid, repo, path,
                     arg_max(op, lsn)       AS op,
                     arg_max("commit", lsn) AS commit,
                     arg_max(lang, lsn)     AS lang,
                     arg_max(content, lsn)  AS content,
                     max(lsn)               AS lsn
              FROM wl GROUP BY wid, repo, path
            ),
            seq AS (
              SELECT *,
                lag(op)  OVER (PARTITION BY repo, path ORDER BY wid) AS prev_op,
                lag(lsn) OVER (PARTITION BY repo, path ORDER BY wid) AS plsn
              FROM win
            )
            SELECT repo, path,
                   CASE WHEN op = 'delete' THEN 'delete'
                        WHEN prev_op IS NULL OR prev_op = 'delete' THEN 'insert'
                        ELSE 'update' END AS change_type,
                   commit, lang, content, lsn,
                   CASE WHEN prev_op IS NULL OR prev_op = 'delete' THEN NULL
                        ELSE plsn END AS prev_lsn
            FROM seq
            WHERE NOT (op = 'delete' AND (prev_op IS NULL OR prev_op = 'delete'))
        """,
        # Incremental view maintenance: a materialized GROUP BY advanced
        # per replay window from the preimage-carrying change feed alone
        # (insert/update add, *_preimage subtract; the state table is
        # deleted before the last refresh) must equal a from-scratch
        # GROUP BY over the LWW final state.
        "cdc_incremental_agg": f"""
            WITH log AS ({_LOG}),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
              FROM log
            ),
            state AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'delete')
            SELECT repo, lang,
                   count(*) AS n,
                   -- DuckDB sum(BIGINT) yields HUGEINT; cast to Spark's type
                   CAST(sum(length(content)) AS BIGINT) AS content_chars
            FROM state GROUP BY repo, lang ORDER BY repo, lang
        """,
        # Time travel: the engine's state_as_of (change-feed prefix
        # fold) must equal a plain LWW over the log truncated at the
        # same absolute-LSN window boundary (first 2 of 4 windows;
        # bs = ceil((max_lsn+1)/4) on BOTH sides).
        "cdc_time_travel": f"""
            WITH log AS ({_LOG}),
            p AS (SELECT (MAX(lsn) + 4) // 4 AS bs FROM log),
            pre AS (
              SELECT * FROM log WHERE lsn < 2 * (SELECT bs FROM p)
            )
            SELECT repo, path,
                   arg_max("commit", lsn) AS commit,
                   arg_max(lang, lsn)     AS lang,
                   arg_max(content, lsn)  AS content,
                   max(lsn)               AS lsn,
                   sha256(arg_max(content, lsn)) AS content_sha256
            FROM pre GROUP BY repo, path
            HAVING arg_max(op, lsn) <> 'delete'
        """,
        # Checkpointed time travel: the engine checkpoints the state at
        # the 2-window boundary, prunes every covered feed dir, and
        # reconstructs as of the 3-window boundary from checkpoint +
        # surviving feed. Must equal the plain LWW truncated at 3·bs.
        "cdc_checkpoint_travel": f"""
            WITH log AS ({_LOG}),
            p AS (SELECT (MAX(lsn) + 4) // 4 AS bs FROM log),
            pre AS (
              SELECT * FROM log WHERE lsn < 3 * (SELECT bs FROM p)
            )
            SELECT repo, path,
                   arg_max("commit", lsn) AS commit,
                   arg_max(lang, lsn)     AS lang,
                   arg_max(content, lsn)  AS content,
                   max(lsn)               AS lsn,
                   sha256(arg_max(content, lsn)) AS content_sha256
            FROM pre GROUP BY repo, path
            HAVING arg_max(op, lsn) <> 'delete'
        """,
        "cdc_first_writer_wins": f"""
            WITH log AS ({_LOG}),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY lsn ASC) AS rn
              FROM log
            )
            SELECT repo, path, "commit", lang, content, lsn, op
            FROM ranked WHERE rn = 1
        """,
        "cdc_prioritized_dedup": f"""
            WITH log AS ({_LOG}),
            payloaded AS (
              SELECT repo, path, lsn,
                     CASE WHEN lang = 'view' THEN '' ELSE content END AS payload
              FROM log
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY repo, path
                ORDER BY CASE WHEN payload IS NOT NULL AND trim(payload) <> ''
                              THEN 0 ELSE 1 END ASC, lsn DESC) AS rn
              FROM payloaded
            )
            SELECT repo, path, payload, lsn FROM ranked WHERE rn = 1
        """,
        "cdc_repo_stats": f"""
            WITH log AS ({_LOG}),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
              FROM log
            ),
            state AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'delete')
            SELECT repo,
                   count(*) AS n_paths,
                   max(lsn) AS max_lsn,
                   min(lsn) AS min_lsn,
                   -- DuckDB sum(BIGINT) yields HUGEINT (int128), which the
                   -- driver's Arrow fetch renders differently from Spark's
                   -- BIGINT — cast to the type Spark produces.
                   CAST(sum(length(content)) AS BIGINT) AS total_bytes
            FROM state GROUP BY repo ORDER BY repo
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "flagship_report": """
            WITH parts_per_order AS (
              SELECT l_orderkey,
                     string_agg(p_name, ' / ' ORDER BY p_name) AS part_names
              FROM lineitem JOIN part ON l_partkey = p_partkey
              GROUP BY l_orderkey
            )
            SELECT o.o_orderkey,
                   upper(c.c_name) AS customer,
                   coalesce(n.n_name, 'UNKNOWN') AS nation,
                   coalesce(r.r_name, 'UNKNOWN') AS region,
                   CASE WHEN o.o_orderstatus = 'O' THEN 'OPEN'
                        WHEN o.o_orderstatus = 'F' THEN 'FINISHED'
                        ELSE 'OTHER' END AS status_desc,
                   strftime(o.o_orderdate, '%d/%m/%Y') AS order_date_br,
                   o.o_totalprice AS total_price,
                   coalesce(p.part_names, '') AS part_names
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
            LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
            LEFT JOIN parts_per_order p ON o.o_orderkey = p.l_orderkey
            WHERE o.o_orderstatus IN ('O', 'F') AND o.o_totalprice > 1000.0
            ORDER BY total_price DESC, o.o_orderkey ASC
            LIMIT 20
        """,
        "flagship_full": """
            WITH parts_per_order AS (
              SELECT l_orderkey,
                     string_agg(p_name, ' / ' ORDER BY p_name) AS part_names
              FROM lineitem JOIN part ON l_partkey = p_partkey
              GROUP BY l_orderkey
            ),
            supp_named AS (
              SELECT s_suppkey,
                     s_name || ' (' || coalesce(n_name, '?') || ')' AS s_label
              FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
            ),
            supps_per_order AS (
              SELECT l_orderkey,
                     string_agg(s_label, ' / ' ORDER BY s_label) AS supplier_names
              FROM lineitem JOIN supp_named ON l_suppkey = s_suppkey
              GROUP BY l_orderkey
            )
            SELECT o.o_orderkey,
                   upper(c.c_name) AS customer,
                   trim(
                     coalesce(nullif(trim(c.c_mktsegment), '') || ' - ', '') ||
                     upper(c.c_name) ||
                     coalesce(' [' || nullif(n.n_name, 'BRAZIL') || ']',
                              ' [LOCAL]')
                   ) AS customer_line,
                   coalesce(n.n_name, 'UNKNOWN') AS nation,
                   coalesce(r.r_name, 'UNKNOWN') AS region,
                   CASE WHEN o.o_orderstatus = 'O' THEN 'OPEN'
                        WHEN o.o_orderstatus = 'F' THEN 'FINISHED'
                        ELSE 'OTHER' END AS status_desc,
                   strftime(o.o_orderdate, '%d/%m/%Y') AS order_date_br,
                   o.o_totalprice AS total_price,
                   coalesce(p.part_names, '') AS part_names,
                   coalesce(s.supplier_names, '') AS supplier_names
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
            LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
            LEFT JOIN parts_per_order p ON o.o_orderkey = p.l_orderkey
            LEFT JOIN supps_per_order s ON o.o_orderkey = s.l_orderkey
            WHERE o.o_orderstatus IN ('O', 'F') AND o.o_totalprice > 1000.0
            ORDER BY total_price DESC, o.o_orderkey ASC
            LIMIT 20
        """,
        "q3_group_concat": """
            SELECT l_orderkey AS orderkey,
                   string_agg(p_brand, ' / ' ORDER BY p_brand) AS brands,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY l_orderkey
        """,
        "q4_case_decode": """
            SELECT CASE WHEN event_type = 'purchase' THEN 'COMPRA'
                        WHEN event_type = 'view' THEN 'VISUALIZACAO'
                        WHEN event_type = 'click' THEN 'CLIQUE'
                        ELSE 'OUTRO' END AS tipo,
                   count(*) AS n,
                   round(sum(value), 2) AS total
            FROM events GROUP BY tipo ORDER BY tipo
        """,
        "q6_date_format": """
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   count(*) AS n,
                   min(strftime(o_orderdate, '%d/%m/%Y')) AS first_date_br
            FROM orders GROUP BY month ORDER BY month
        """,
        "q7_filter_topk": """
            SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
            FROM orders
            WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
              AND o_totalprice BETWEEN 500.0 AND 50000.0
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 25
        """,
        "q9_union_parts": """
            WITH u AS (
              SELECT * FROM orders WHERE o_orderkey % 2 = 0
              UNION ALL
              SELECT * FROM orders WHERE o_orderkey % 2 = 1
            )
            SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
            FROM u GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        "fk_orphan_audit": """
            WITH kept_orders AS (SELECT * FROM orders WHERE o_orderkey % 10 <> 0)
            SELECT l_orderkey AS orderkey, count(*) AS n_lines
            FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM kept_orders o WHERE o.o_orderkey = l.l_orderkey)
            GROUP BY l_orderkey
        """,
        "semi_join_orders": """
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders o
            WHERE EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00')
        """,
        "window_running_sum": """
            SELECT o_custkey, o_orderkey,
                   round(sum(o_totalprice) OVER (
                     PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_total
            FROM orders
        """,
        "topk_per_group": """
            SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
              FROM orders) WHERE rnk <= 3
        """,
        "explode_words": """
            WITH words AS (
              SELECT doc_id, trim(unnest(string_split(text, ' '))) AS word
              FROM documents
            )
            SELECT word, count(*) AS n
            FROM words WHERE len(word) > 0
            GROUP BY word
            ORDER BY n DESC, word
            LIMIT 30
        """,
        "norm_dates": """
            WITH dirty AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 97 = 0 THEN '00000000'
                          WHEN o_orderkey % 89 = 0 THEN '0'
                          WHEN o_orderkey % 83 = 0 THEN ''
                          ELSE strftime(o_orderdate, '%Y%m%d') END AS raw_date
              FROM orders
            )
            SELECT o_orderkey, raw_date,
                   CAST(try_strptime(raw_date, '%Y%m%d') AS DATE) AS clean_date
            FROM dirty
        """,
        "norm_numeric_br": """
            WITH dirty AS (
              SELECT o_orderkey,
                     '1.' || CAST(o_orderkey AS VARCHAR) || ',50' AS raw_val
              FROM orders
            )
            SELECT o_orderkey, raw_val,
                   -- DOUBLE on both sides: DECIMAL(16,2) renders with
                   -- trailing-zero differences at the driver's fetch layer
                   -- ('1100.50' vs '1100.5'); the .50 fractions are exact
                   -- in binary floating point, so DOUBLE is lossless here.
                   CAST(CAST(replace(replace(raw_val, '.', ''), ',', '.')
                        AS DECIMAL(16,2)) AS DOUBLE) AS clean_val
            FROM dirty
        """,
        "sanitize_strings": """
            SELECT c_custkey, trim('  ' || c_name || '   ') AS clean_name
            FROM customer
        """,
        "zero_pad_codes": """
            SELECT n_name, lpad(CAST(n_nationkey AS VARCHAR), 3, '0') AS code3
            FROM nation ORDER BY n_name
        """,
        "content_hashes": """
            SELECT doc_id, sha256(text) AS sha FROM documents
        """,
        "dedup_exact_docs": """
            SELECT doc_id, text FROM (
              SELECT doc_id, text,
                     row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
              FROM documents) WHERE rn = 1
        """,
        "doc_token_stats": """
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS n_tokens,
                   length(text) AS n_chars,
                   len(list_distinct(list_filter(string_split(text, ' '), x -> len(x) > 0)))
                     AS n_distinct_tokens
            FROM documents
        """,
        "ngram_jaccard_dups": f"""
            {_SHINGLES},
            -- posting-list cap (max_df=50): shingles in more than 50 docs
            -- are removed from the shingle space (postings AND sizes),
            -- mirroring ngram_jaccard_pairs' document-frequency cap
            kept AS (
              SELECT id, sh FROM (
                SELECT id, sh, count(*) OVER (PARTITION BY sh) AS dfreq
                FROM sh
              ) WHERE dfreq <= 50
            ),
            sizes AS (SELECT id, count(*) AS n_sh FROM kept GROUP BY id),
            pairs AS (
              SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
              FROM kept a JOIN kept b ON a.sh = b.sh AND a.id < b.id
              GROUP BY a.id, b.id
            )
            SELECT p.id_a, p.id_b,
                   p.common / (sa.n_sh + sb.n_sh - p.common) AS jaccard
            FROM pairs p
            JOIN sizes sa ON p.id_a = sa.id
            JOIN sizes sb ON p.id_b = sb.id
            WHERE p.common / (sa.n_sh + sb.n_sh - p.common) >= 0.5
        """,
        "ann_cosine_topk": """
            WITH q AS (
              SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 3
            ),
            scored AS (
              SELECT q.q_id, e.vec_id,
                     list_cosine_similarity(
                       list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(q.q_vec, x -> CAST(x AS DOUBLE))) AS raw_score
              FROM embeddings e CROSS JOIN q
            ),
            ranked AS (
              SELECT q_id, vec_id, raw_score,
                     row_number() OVER (
                       PARTITION BY q_id ORDER BY raw_score DESC, vec_id ASC) AS rank
              FROM scored
            )
            SELECT q_id, vec_id, round(raw_score, 6) AS score, rank
            FROM ranked WHERE rank <= 5
        """,
        "media_features": """
            WITH media AS (
              SELECT range AS media_id,
                     CASE range % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                          ELSE 'video' END AS kind,
                     'payload_' || md5(CAST(range AS VARCHAR)) AS payload
              FROM range(0, 200)
            )
            SELECT media_id, kind,
                   CAST(length(payload) AS BIGINT) AS n_bytes,
                   sha256(payload) AS payload_sha256
            FROM media
        """,
        "media_frame_plan": """
            WITH media AS (
              SELECT range AS media_id,
                     CASE range % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                          ELSE 'video' END AS kind,
                     CASE WHEN range % 3 = 2 THEN range * 500 + 1000 END AS duration_ms
              FROM range(0, 200)
            )
            SELECT media_id,
                   unnest(range(0, greatest(CAST(duration_ms // 1000 AS BIGINT), 1)))
                     AS frame_idx,
                   unnest(range(0, greatest(CAST(duration_ms // 1000 AS BIGINT), 1)))
                     * 1000 AS ts_ms
            FROM media WHERE kind = 'video'
        """,
        "static_dim_upsert": """
            SELECT nationkey, name FROM (
              SELECT nationkey, name,
                     row_number() OVER (PARTITION BY nationkey ORDER BY prio) AS rn
              FROM (
                SELECT n_nationkey AS nationkey, n_name AS name, 0 AS prio FROM nation
                UNION ALL
                SELECT * FROM (VALUES
                  (0, 'ALGERIA-PATCHED', 1),
                  (900, 'ATLANTIS', 1),
                  (901, 'ELBONIA', 1)) v(nationkey, name, prio)
              )
            ) WHERE rn = 1
        """,
        "orphan_delete": """
            SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
            FROM orders WHERE o_custkey NOT IN (7, 42, 99, 123, 256)
            GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        "doc_text_features": _DOC_FEATURES_SQL,
        "doc_quality": rf"""
            SELECT f.doc_id, f.n_tokens, f.n_bpe_tokens, f.lang_pred,
                   f.quality,
                   md5(lower(trim(regexp_replace(d.text, '\s+', ' ', 'g'))))
                     AS fingerprint
            FROM ({_DOC_FEATURES_SQL}) f
            JOIN documents d ON f.doc_id = d.doc_id
        """,
        "doc_fingerprints": r"""
            SELECT doc_id,
                   md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp_md5
            FROM documents
        """,
        "minhash_dups": f"""
            {_SHINGLES},
            sig AS ({_minhash_sig_sql()}),
            banded AS (
              {_minhash_band_sql()}
            ),
            cand AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM banded a
              JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                           AND a.id < b.id
            ),
            est AS (
              SELECT c.id_a, c.id_b, {_minhash_est_sql()} AS est_jaccard
              FROM cand c
              JOIN sig sa ON sa.id = c.id_a
              JOIN sig sb ON sb.id = c.id_b
            )
            SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5
        """,
        # The incremental index must equal the from-scratch LSH pipeline
        # restricted to pairs touching the "new batch" slice
        # (doc_id % 10 < 2) — the oracle IS that restriction, so a stale
        # posting, a missed removal, or an unpruned/overpruned partition
        # read in the bucketed index would all hash-mismatch here.
        "minhash_incremental": f"""
            {_SHINGLES},
            sig AS ({_minhash_sig_sql()}),
            banded AS (
              {_minhash_band_sql()}
            ),
            cand AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM banded a
              JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                           AND a.id < b.id
            ),
            est AS (
              SELECT c.id_a, c.id_b, {_minhash_est_sql()} AS est_jaccard
              FROM cand c
              JOIN sig sa ON sa.id = c.id_a
              JOIN sig sb ON sb.id = c.id_b
            )
            SELECT id_a, id_b, est_jaccard FROM est
            WHERE est_jaccard >= 0.5
              AND (id_a % 10 < 2 OR id_b % 10 < 2)
        """,
        # transitive closure (recursive CTE) over the SAME md5-affine
        # pair set the Spark side feeds into label propagation; cluster
        # id = min reachable doc_id. A propagation bug (early stop,
        # asymmetric edges, lost label) hash-mismatches here.
        "near_dup_clusters": f"""
            {_SHINGLES.replace("WITH toks", "WITH RECURSIVE toks", 1)},
            {_minhash_closure_sql()}
            SELECT node AS doc_id, least(node, min(r)) AS cluster_id
            FROM closure GROUP BY node
        """,
        "dedup_canonical_docs": f"""
            {_SHINGLES.replace("WITH toks", "WITH RECURSIVE toks", 1)},
            {_minhash_closure_sql()},
            victims AS (
              SELECT node AS doc_id FROM closure
              GROUP BY node HAVING least(node, min(r)) <> node
            )
            SELECT d.doc_id, d.lang, d.source, d.n_chars
            FROM documents d
            WHERE d.doc_id NOT IN (SELECT doc_id FROM victims)
        """,
        "simhash_dups": f"""
            WITH toks AS ({_TOKS}),
            td AS (
              SELECT doc_id AS id, unnest(list_distinct(t)) AS tok FROM toks
            ),
            h AS (
              SELECT id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS b
              FROM td
            ),
            votes AS ({_simhash_votes_sql()}),
            sk AS ({_simhash_pack_sql()}),
            blocked AS (
              {_simhash_block_sql()}
            ),
            cand AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                     a.sh AS sh_a, b.sh AS sh_b
              FROM blocked a
              JOIN blocked b ON a.blk = b.blk AND a.val = b.val AND a.id < b.id
            )
            SELECT id_a, id_b, hamming FROM (
              SELECT id_a, id_b, bit_count(xor(sh_a, sh_b)) AS hamming
              FROM cand
            ) WHERE hamming <= 3
        """,
        "embedding_near_dups": f"""
            WITH e AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
            ),
            b AS (
              SELECT vec_id AS id, v, {_lsh_bucket_sql("v")} AS bucket FROM e
            ),
            pairs AS (
              SELECT a.id AS id_a, b2.id AS id_b,
                     round({_cos_sql("a.v", "b2.v")}, 6) AS cos
              FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.id < b2.id
            )
            SELECT id_a, id_b, cos FROM pairs WHERE cos >= 0.4
        """,
        "embedding_dup_clusters": f"""
            WITH RECURSIVE e AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
            ),
            b AS (
              SELECT vec_id AS id, v, {_lsh_bucket_sql("v")} AS bucket FROM e
            ),
            pairs AS (
              SELECT a.id AS id_a, b2.id AS id_b
              FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.id < b2.id
              WHERE round({_cos_sql("a.v", "b2.v")}, 6) >= 0.4
            ),
            ed AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION
              SELECT id_b, id_a FROM pairs
            ),
            closure(node, r) AS (
              SELECT src, dst FROM ed
              UNION
              SELECT c.node, ed.dst FROM closure c JOIN ed ON ed.src = c.r
            )
            SELECT node AS vec_id, least(node, min(r)) AS cluster_id
            FROM closure GROUP BY node
        """,
        "embedding_near_dups_exact": """
            WITH e AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.v, b.v), 6) AS cos
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4
        """,
        "ann_lsh_topk": f"""
            WITH e AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
            ),
            cb AS (
              SELECT vec_id, v, {_lsh_bucket_sql("v")} AS bucket FROM e
            ),
            q AS (
              SELECT vec_id AS q_id, v AS qv, bucket FROM cb WHERE vec_id < 3
            ),
            scored AS (
              SELECT q.q_id, c.vec_id, {_cos_sql("c.v", "q.qv")} AS raw
              FROM cb c JOIN q ON c.bucket = q.bucket
            ),
            ranked AS (
              SELECT q_id, vec_id, raw,
                     row_number() OVER (
                       PARTITION BY q_id ORDER BY raw DESC, vec_id ASC) AS rank
              FROM scored
            )
            SELECT q_id, vec_id, round(raw, 6) AS score, rank
            FROM ranked WHERE rank <= 5
        """,
        "ann_ivf_topk": f"""
            WITH e AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
            ),
            cents AS (
              SELECT vec_id AS cid, v AS cv FROM e
              ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 8
            ),
            assign AS (
              SELECT e.vec_id, e.v, c.cid,
                     row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_cos_sql("e.v", "c.cv")} DESC, c.cid DESC
                     ) AS rn
              FROM e CROSS JOIN cents c
            ),
            cb AS (SELECT vec_id, v, cid AS cluster FROM assign WHERE rn = 1),
            q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 3),
            probe AS (
              SELECT q.q_id, q.qv, c.cid AS cluster,
                     row_number() OVER (
                       PARTITION BY q.q_id
                       ORDER BY {_cos_sql("q.qv", "c.cv")} DESC, c.cid DESC
                     ) AS rn
              FROM q CROSS JOIN cents c
            ),
            qp AS (SELECT q_id, qv, cluster FROM probe WHERE rn <= 3),
            scored AS (
              SELECT qp.q_id, cb.vec_id, {_cos_sql("cb.v", "qp.qv")} AS raw
              FROM cb JOIN qp ON cb.cluster = qp.cluster
            ),
            ranked AS (
              SELECT q_id, vec_id, raw,
                     row_number() OVER (
                       PARTITION BY q_id ORDER BY raw DESC, vec_id ASC) AS rank
              FROM scored
            )
            SELECT q_id, vec_id, round(raw, 6) AS score, rank
            FROM ranked WHERE rank <= 5
        """,
        "cnpj_etl_e2e": f"""
            WITH est_raw AS (
              SELECT * FROM read_csv('{FIXTURE_DIR}/Estabelecimentos*.csv',
                header=false, sep=';',
                columns={_cnpj_csv_cols("estabelecimento")})
            ),
            emp_raw AS (
              SELECT * FROM read_csv('{FIXTURE_DIR}/Empresas0.csv',
                header=false, sep=';',
                columns={_cnpj_csv_cols("empresa")})
            ),
            est AS (
              SELECT {_sql_sanitize("cnpj_basico")} AS cnpj_basico,
                     {_sql_sanitize("cnpj_ordem")} AS cnpj_ordem,
                     {_sql_sanitize("cnpj_dv")} AS cnpj_dv,
                     {_sql_sanitize("nome_fantasia")} AS fantasia,
                     {_sql_date("data_situacao_cadastral")} AS situacao_date,
                     {_sql_date("data_inicio_atividade")} AS inicio_date,
                     {_sql_sanitize("uf")} AS uf,
                     {_sql_sanitize("cod_cnae_secundario")} AS sec
              FROM est_raw
            ),
            emp AS (
              SELECT {_sql_sanitize("cnpj_basico")} AS cnpj_basico,
                     {_sql_sanitize("razao_social")} AS razao_social,
                     {_sql_numeric_br("capital_social")} AS capital
              FROM emp_raw
            ),
            bridge AS (
              SELECT cnpj_basico, cnpj_ordem, cnpj_dv, trim(cae) AS cod_cnae
              FROM (
                SELECT cnpj_basico, cnpj_ordem, cnpj_dv,
                       unnest(string_split(sec, ',')) AS cae
                FROM est
              ) WHERE len(trim(cae)) > 0
            ),
            sec_counts AS (
              SELECT cnpj_basico, cnpj_ordem, cnpj_dv, count(*) AS n_sec
              FROM bridge GROUP BY cnpj_basico, cnpj_ordem, cnpj_dv
            )
            SELECT e.cnpj_basico, e.cnpj_ordem, e.cnpj_dv, e.fantasia,
                   e.situacao_date, e.inicio_date,
                   coalesce(m.razao_social, 'SEM EMPRESA') AS razao_social,
                   m.capital AS capital,
                   coalesce(b.n_sec, 0) AS n_sec,
                   e.uf
            FROM est e
            LEFT JOIN emp m ON e.cnpj_basico = m.cnpj_basico
            LEFT JOIN sec_counts b
              ON e.cnpj_basico = b.cnpj_basico
             AND e.cnpj_ordem = b.cnpj_ordem
             AND e.cnpj_dv = b.cnpj_dv
        """,
        "jsonl_doc_stats": f"""
            WITH docs AS (
              SELECT * FROM read_json('{JSONL_DIR}/docs*.jsonl',
                format='newline_delimited', ignore_errors=true,
                columns={{'doc_id': 'BIGINT', 'text': 'VARCHAR',
                          'lang': 'VARCHAR', 'source': 'VARCHAR'}})
            )
            SELECT lang, source,
                   count(*) AS n_docs,
                   CAST(sum(len(list_filter(string_split(text, ' '),
                                            x -> len(x) > 0))) AS BIGINT)
                     AS n_tokens,
                   min(doc_id) AS min_id,
                   max(doc_id) AS max_id
            FROM docs WHERE doc_id IS NOT NULL
            GROUP BY lang, source ORDER BY lang, source
        """,
        # cnpj_cp1252_roundtrip is the one intentionally rows-only entry:
        # the windows-1252 errors='ignore' re-encode (the canonical custom
        # pandas UDF, T2) is genuinely inexpressible in DuckDB SQL; its
        # byte-exactness is pytest-golden-tested instead.
    }
