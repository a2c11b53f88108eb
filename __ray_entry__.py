"""Driver contract for the graft builder (Ray Data target).

The driver calls ``entry()`` as a smoke check (Ray already initialised),
runs each ``queries()[name](sf_dir)`` at sf=0.01 and compares against the
matching ``oracle_sql()[name]`` via DuckDB.  Neither this module nor the
library calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on sf0.001: derive tokens from documents, build the
    sharded Bloom/HLL/CMS/t-digest/KLL bank index, return the per-source
    summary (stable schema, >= 1 row)."""
    from metaprofi_ray.pipelines import flagship

    return flagship.bloom_build_sources("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from metaprofi_ray.pipelines import (
        ann,
        clustering,
        dedup,
        flagship,
        multimodal,
        relational,
        textstats,
    )

    return {
        # --- sketch engine (SURVEY.md §2.4) -----------------------------
        "bloom_build_sources": flagship.bloom_build_sources,
        "bloom_query_self": flagship.bloom_query_self,
        "bloom_query_theta50": lambda sf_dir: flagship.bloom_query_self(sf_dir, theta=50),
        "bloom_fpr_report": flagship.bloom_fpr_report,
        "hll_distinct_per_source": flagship.hll_distinct_per_source,
        "cms_token_estimates": flagship.cms_token_estimates,
        "doclen_quantiles": flagship.doclen_quantiles,
        # --- relational operators (§2.2/2.4/2.5/2.6) --------------------
        "q1_pricing_summary": relational.q1_pricing_summary,
        "top_customers": relational.top_customers,
        "events_hourly": relational.events_hourly,
        "events_sessionize": relational.events_sessionize,
        "supplier_nation_rollup": relational.supplier_nation_rollup,
        "part_brand_stats": relational.part_brand_stats,
        "order_priority_counts": relational.order_priority_counts,
        "lineitem_filter_project": relational.lineitem_filter_project,
        "distinct_segments": relational.distinct_segments,
        "top_parts_per_brand": relational.top_parts_per_brand,
        "kmeans_embeddings": clustering.kmeans_embeddings,
        "events_prior_orders": relational.events_prior_orders,
        "customers_without_orders": relational.customers_without_orders,
        "events_running_value": relational.events_running_value,
        # --- training-data ops: text ------------------------------------
        "token_counts": textstats.token_counts,
        "documents_sample": textstats.documents_sample,
        "token_topk": textstats.token_topk,
        "quality_scores": textstats.quality_scores,
        "language_id": textstats.language_id,
        "doc_fingerprints": textstats.doc_fingerprints,
        # --- training-data ops: dedup -----------------------------------
        "exact_dedup": dedup.exact_dedup,
        "exact_dup_canonical": dedup.exact_dup_canonical,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "simhash_pairs": dedup.simhash_pairs,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "dedup_keep_canonical": dedup.dedup_keep_canonical,
        "embedding_neardup_pairs": dedup.embedding_neardup_pairs,
        # --- similarity search ------------------------------------------
        "ann_brute_topk": ann.brute_force_topk,
        "ann_lsh_topk": ann.lsh_topk,
        "knn_label_stats": ann.knn_label_stats,
        # --- multimodal binary-column plumbing (decode stubbed) ---------
        "media_bytes_per_kind": multimodal.media_bytes_per_kind,
        "media_stats": multimodal.media_stats,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles.  Column names match the Ray outputs exactly; float
    aggregates are rounded identically on both sides.  Non-SQL-expressible
    sketch/LSH ops are omitted (driver records rows-only checks)."""
    K = 8  # flagship shingle width (flagship.DEFAULT_CFG.k)
    n_words = (
        "CASE WHEN trim(text) = '' THEN 0 "
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
    )
    return {
        "bloom_build_sources": f"""
            WITH w AS (SELECT source, {n_words} AS nw FROM documents)
            SELECT source,
                   CAST(COUNT(*) FILTER (WHERE nw >= {K}) AS BIGINT) AS n_docs,
                   CAST(COALESCE(SUM(CASE WHEN nw >= {K} THEN nw - {K} + 1 END), 0) AS BIGINT) AS n_wins,
                   CAST(COALESCE(SUM(CASE WHEN nw >= {K} THEN nw END), 0) AS BIGINT) AS n_tokens
            FROM w GROUP BY source ORDER BY source
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   ROUND(AVG(l_discount), 4) AS avg_disc,
                   CAST(COUNT(*) AS BIGINT) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "top_customers": """
            SELECT o_custkey, c_name, ROUND(SUM(o_totalprice), 2) AS total_spent
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY o_custkey, c_name
            ORDER BY SUM(o_totalprice) DESC, o_custkey ASC LIMIT 10
        """,
        "events_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   ROUND(SUM(value), 2) AS sum_value
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "events_sessionize": """
            WITH gaps AS (
                SELECT user_id,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
                FROM events
            )
            SELECT user_id,
                   CAST(SUM(new_session) + 1 AS BIGINT) AS n_sessions,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM gaps GROUP BY user_id
        """,
        "supplier_nation_rollup": """
            SELECT r_name, n_name,
                   CAST(COUNT(*) AS BIGINT) AS n_suppliers,
                   ROUND(SUM(s_acctbal), 2) AS total_acctbal
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """,
        "part_brand_stats": """
            SELECT p_brand,
                   CAST(COUNT(*) AS BIGINT) AS n_parts,
                   MIN(p_retailprice) AS min_price,
                   MAX(p_retailprice) AS max_price,
                   ROUND(AVG(p_retailprice), 4) AS avg_price,
                   CAST(SUM(p_size) AS BIGINT) AS sum_size
            FROM part GROUP BY p_brand
        """,
        "order_priority_counts": """
            SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority
        """,
        "lineitem_filter_project": """
            SELECT l_orderkey, l_linenumber, l_quantity,
                   l_extendedprice * (1 - l_discount) AS revenue
            FROM lineitem WHERE l_quantity > 45.0
        """,
        "distinct_segments": """
            SELECT DISTINCT c_mktsegment FROM customer
        """,
        "top_parts_per_brand": """
            SELECT p_brand, p_partkey, p_retailprice FROM part
            QUALIFY row_number() OVER (
                PARTITION BY p_brand
                ORDER BY p_retailprice DESC, p_partkey ASC
            ) <= 3
        """,
        "events_prior_orders": """
            SELECT e.event_id,
                   max(o.o_orderdate) AS last_order_date,
                   CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_prior_orders
            FROM events e LEFT JOIN orders o
              ON (o.o_custkey % 150) = e.user_id AND o.o_orderdate <= e.ts
            GROUP BY e.event_id
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
            )
        """,
        "events_running_value": """
            SELECT event_id, user_id,
                   ROUND(SUM(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ), 2) AS running_value
            FROM events
        """,
        "token_counts": f"""
            SELECT doc_id, CAST({n_words} AS BIGINT) AS n_tokens FROM documents
        """,
        "documents_sample": """
            SELECT doc_id, source, n_chars FROM documents
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 10
        """,
        "token_topk": f"""
            WITH words AS (
                SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
                FROM documents WHERE trim(text) <> ''
            )
            SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM words
            GROUP BY token ORDER BY n DESC, token ASC LIMIT 20
        """,
        "exact_dedup": """
            SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_doc_id
            FROM documents GROUP BY md5(text)
        """,
        "exact_dup_canonical": """
            SELECT doc_id,
                   MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical,
                   doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep
            FROM documents ORDER BY doc_id
        """,
        "ann_brute_topk": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   ROUND(list_cosine_similarity(e.embedding, q.qe), 4) AS cosine
            FROM embeddings e, q WHERE e.vec_id <> 0
            ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id ASC
            LIMIT 10
        """,
        "embedding_neardup_pairs": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   ROUND(list_cosine_similarity(a.embedding, b.embedding), 4) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        """,
        "media_bytes_per_kind": """
            WITH ordered AS (
                SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 200
            ), m AS (
                SELECT octet_length(encode(text)) AS nb,
                       (row_number() OVER (ORDER BY doc_id) - 1) % 3 AS kcode
                FROM ordered
            )
            SELECT CASE kcode WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                   ELSE 'video' END AS kind,
                   CAST(COUNT(*) AS BIGINT) AS n_media,
                   CAST(SUM(nb) AS BIGINT) AS total_bytes
            FROM m GROUP BY kcode
        """,
        "knn_label_stats": """
            WITH expl AS (
                SELECT label, i, embedding[i] AS x
                FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
            ), cent AS (
                SELECT label, i, AVG(x) AS c FROM expl GROUP BY label, i
            ), norms AS (
                SELECT label, ROUND(sqrt(SUM(c * c)), 4) AS centroid_norm
                FROM cent GROUP BY label
            ), counts AS (
                SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
                FROM embeddings GROUP BY label
            )
            SELECT counts.label, n_vecs, centroid_norm
            FROM counts JOIN norms ON counts.label = norms.label
        """,
    }
