"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in joern_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: deterministic webtext corpus (sf0.001 scale) →
    full CPG build (parse + overlays + linking + partitioned write) →
    returns the final edges Dataset."""
    from joern_ray.pipelines.cpg import read_edges
    from joern_ray.pipelines.queries import _cpg_paths

    res = _cpg_paths("/root/testdata/sf0.001")
    return read_edges(res["out_dir"])


def queries() -> dict[str, Callable[[str], Any]]:
    from joern_ray.pipelines import queries as q

    return {
        # CPG flagship family (not SQL-expressible → rows-only checks)
        "cpg_node_counts": q.cpg_node_counts,
        "cpg_edge_counts": q.cpg_edge_counts,
        "cpg_method_table": q.cpg_method_table,
        "cpg_call_resolution": q.cpg_call_resolution,
        "cpg_typehint_stats": q.cpg_typehint_stats,
        "cpg_dispatch_stats": q.cpg_dispatch_stats,
        "cpg_fieldaccess_stats": q.cpg_fieldaccess_stats,
        "scan_dangerous_calls": q.scan_dangerous_calls,
        "scan_bundle": q.scan_bundle,
        # generic engine operators over testdata (SQL-checkable)
        "lang_counts": q.lang_counts,
        "exact_dedup_documents": q.exact_dedup_documents,
        "token_count_ws": q.token_count_ws,
        "doc_length_filter": q.doc_length_filter,
        "top_users_by_events": q.top_users_by_events,
        "events_daily_counts": q.events_daily_counts,
        "pricing_summary": q.pricing_summary,
        "customers_per_nation": q.customers_per_nation,
        "distinct_part_types": q.distinct_part_types,
        "orders_top_by_price": q.orders_top_by_price,
        "event_type_stats": q.event_type_stats,
        "suppliers_per_region": q.suppliers_per_region,
        # similarity / dedup / text / multimodal operators
        "embedding_topk": q.embedding_topk,
        "embedding_near_dup_exact": q.embedding_near_dup_exact,
        "embedding_near_dup_lsh": q.embedding_near_dup_lsh,
        "embedding_ivf_topk": q.embedding_ivf_topk,
        "minhash_near_dups_corpus": q.minhash_near_dups_corpus,
        "minhash_dedup_corpus": q.minhash_dedup_corpus,
        "simhash_near_dups_corpus": q.simhash_near_dups_corpus,
        "lang_id_eval": q.lang_id_eval,
        "doc_fingerprints": q.doc_fingerprints,
        "quality_scores": q.quality_scores,
        "media_feature_stats": q.media_feature_stats,
        # dataflow + export
        "dataflow_malloc_to_free": q.dataflow_malloc_to_free,
        "export_dot_methods": q.export_dot_methods,
        "method_vectors_corpus": q.method_vectors_corpus,
        "export_pdg_methods": q.export_pdg_methods,
        # round-2 additions
        "customer_segment_counts": q.customer_segment_counts,
        "part_size_stats": q.part_size_stats,
        "orders_status_priority": q.orders_status_priority,
        "events_user_daily_distinct": q.events_user_daily_distinct,
        "word_freq_top20": q.word_freq_top20,
        "orders_monthly_counts": q.orders_monthly_counts,
        "doc_source_stats": q.doc_source_stats,
        "method_lang_counts": q.method_lang_counts,
        "scan_conformance": q.scan_conformance,
        "usage_slice_stats": q.usage_slice_stats,
        # round-5 additions
        "tag_overlay_stats": q.tag_overlay_stats,
        "brand_part_counts": q.brand_part_counts,
        "supplier_balance_extremes": q.supplier_balance_extremes,
        "lineitem_returnflag_dates": q.lineitem_returnflag_dates,
        "order_priority_by_year": q.order_priority_by_year,
        "orders_by_nation_status": q.orders_by_nation_status,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "lang_counts": (
            "SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY lang"
        ),
        "exact_dedup_documents": (
            "SELECT min(doc_id) AS doc_id, count(*) AS n_dups "
            "FROM documents GROUP BY text ORDER BY doc_id"
        ),
        "token_count_ws": (
            "SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens_ws "
            "FROM documents ORDER BY doc_id"
        ),
        "doc_length_filter": (
            "SELECT doc_id, length(text) AS n_chars_text FROM documents "
            "WHERE length(text) BETWEEN 100 AND 5000 ORDER BY doc_id"
        ),
        "top_users_by_events": (
            "SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id "
            "ORDER BY n_events DESC, user_id LIMIT 10"
        ),
        "events_daily_counts": (
            "SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n "
            "FROM events GROUP BY day ORDER BY day"
        ),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(l_quantity) AS BIGINT) AS sum_qty, "
            "count(*) AS count_order FROM lineitem "
            "GROUP BY l_returnflag, l_linestatus "
            "ORDER BY l_returnflag, l_linestatus"
        ),
        "customers_per_nation": (
            "SELECT n_name AS nation, count(*) AS n_customers FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY nation"
        ),
        "distinct_part_types": (
            "SELECT count(DISTINCT p_type) AS n_types FROM part"
        ),
        "orders_top_by_price": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 5"
        ),
        "event_type_stats": (
            "SELECT event_type, count(*) AS n_events, min(value) AS min_value, "
            "max(value) AS max_value FROM events GROUP BY event_type "
            "ORDER BY event_type"
        ),
        "suppliers_per_region": (
            "SELECT r_name AS region, count(*) AS n_suppliers FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "GROUP BY r_name ORDER BY region"
        ),
        "embedding_topk": (
            "SELECT vec_id, round(list_cosine_similarity(embedding, "
            "(SELECT embedding FROM embeddings WHERE vec_id = 0)), 4) AS cosine "
            "FROM embeddings WHERE vec_id <> 0 "
            "ORDER BY list_cosine_similarity(embedding, "
            "(SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC, vec_id "
            "LIMIT 10"
        ),
        "embedding_near_dup_exact": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cosine "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95 "
            "ORDER BY id_a, id_b"
        ),
        "customer_segment_counts": (
            "SELECT c_mktsegment, count(*) AS n FROM customer "
            "GROUP BY c_mktsegment ORDER BY c_mktsegment"
        ),
        "part_size_stats": (
            "SELECT p_type, count(*) AS n, min(p_size) AS min_size, "
            "max(p_size) AS max_size FROM part GROUP BY p_type ORDER BY p_type"
        ),
        "orders_status_priority": (
            "SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders "
            "GROUP BY o_orderstatus, o_orderpriority "
            "ORDER BY o_orderstatus, o_orderpriority"
        ),
        "events_user_daily_distinct": (
            "SELECT strftime(ts, '%Y-%m-%d') AS day, "
            "count(DISTINCT user_id) AS n_users FROM events "
            "GROUP BY day ORDER BY day"
        ),
        "word_freq_top20": (
            "SELECT word, count(*) AS n FROM ("
            "SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word "
            "FROM documents) WHERE word <> '' "
            "GROUP BY word ORDER BY n DESC, word LIMIT 20"
        ),
        "orders_monthly_counts": (
            "SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n "
            "FROM orders GROUP BY month ORDER BY month"
        ),
        "doc_source_stats": (
            "SELECT source, count(*) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS total_chars FROM documents "
            "GROUP BY source ORDER BY source"
        ),
        "brand_part_counts": (
            "SELECT p_brand, count(*) AS n_parts, "
            "CAST(max(p_size) AS BIGINT) AS max_size FROM part "
            "GROUP BY p_brand ORDER BY p_brand"
        ),
        "supplier_balance_extremes": (
            "SELECT n_name AS nation, count(*) AS n_suppliers, "
            "min(s_acctbal) AS min_bal, max(s_acctbal) AS max_bal "
            "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
            "GROUP BY n_name ORDER BY nation"
        ),
        "lineitem_returnflag_dates": (
            "SELECT l_returnflag, count(*) AS n, "
            "strftime(min(l_shipdate), '%Y-%m-%d') AS min_ship, "
            "strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship "
            "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        "order_priority_by_year": (
            "SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderpriority, "
            "count(*) AS n FROM orders GROUP BY yr, o_orderpriority "
            "ORDER BY yr, o_orderpriority"
        ),
        "orders_by_nation_status": (
            "SELECT n_name AS nation, o_orderstatus, count(*) AS n_orders, "
            "strftime(min(o_orderdate), '%Y-%m-%d') AS min_date, "
            "strftime(max(o_orderdate), '%Y-%m-%d') AS max_date "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "GROUP BY n_name, o_orderstatus ORDER BY nation, o_orderstatus"
        ),
    }
