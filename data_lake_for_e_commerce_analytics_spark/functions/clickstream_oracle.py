"""DuckDB oracle for the clickstream generator — the full G6 synthesis
(operators/clickstream.py, reference generate_clickstream.py:20-276)
replayed hash-for-hash in a single SELECT.

The generator's only nondeterminism stand-in is Spark ``xxhash64``;
functions/xxh64_sql.py emits that arithmetic as portable SQL step
chains (pinned bit-for-bit against Spark in tests/test_xxh64_sql.py).
This module lays those chains out as CTE stages and rebuilds:

- funnel sessions: delivered filter -> hash-ranked exact-2000 sample
  -> per-order <=3 item pick -> page_view/view_product*/add_to_cart/
  checkout/purchase with hash-derived gaps (clickstream.py:60-144)
- browsing sessions: hash-ranked 1000-order pool, dense index, pmod
  bucket join, 2-6 weighted events (clickstream.py:147-214)
- the 13-column projection with md5 event ids (clickstream.py:217-242)

so `clickstream_generate` / `clickstream_funnel` /
`clickstream_conversion` get full value-hash oracles instead of
rows-only checks.
"""

from __future__ import annotations

from .xxh64_sql import (
    Chain,
    cte_stages,
    int_hash_chain,
    long_hash_chain,
    merge_chains,
    signed_sql,
    str_hash_chain,
    uniform_sql,
)

DEVICES = "['desktop', 'mobile', 'tablet']"
TRAFFIC = "['direct', 'seo', 'ads', 'email', 'social']"

MAX_PURCHASE_SESSIONS = 2000
NUM_BROWSING_SESSIONS = 1000


def _pick_sql(u_ref: str, arr_sql: str, n: int) -> str:
    """clickstream._pick: element_at(arr, least(cast(u*n as int)+1, n))."""
    return f"{arr_sql}[least(CAST(floor(({u_ref}) * {n}) AS INT) + 1, {n})]"


def _gap_sql(u_ref: str) -> str:
    """clickstream.funnel_sessions.gap: 5 + floor(u*55) seconds."""
    return f"(5 + CAST(floor(({u_ref}) * 55) AS BIGINT))"


def clickstream_events_sql() -> tuple[str, str]:
    """Returns (cte_body, final_name): the WITH-clause body producing
    the 13-column clickstream event table under ``final_name``."""
    # ---- funnel sessions -------------------------------------------------
    fo_base = (
        "SELECT o_orderkey AS okey, o_custkey AS ck, o_orderdate AS pts"
        " FROM orders WHERE o_orderstatus = 'F'"
    )
    # sample rank: xxhash64(okey, lit(42)-int) == hashInt(42, hashLong(okey, 42))
    fo_chains: list[Chain] = [
        long_hash_chain("hk", "okey", 42) + int_hash_chain("rk", "42", "hk")
    ]
    fo_body, fo_final = cte_stages("cs_fo", fo_base, merge_chains(fo_chains))

    samp = (
        f"SELECT okey, ck, pts, hk FROM {fo_final}"
        f" ORDER BY {signed_sql('rk')}, okey LIMIT {MAX_PURCHASE_SESSIONS}"
    )
    # per-sampled-order uniforms: tags chained on hk = hashLong(okey, 42)
    tag_chains = [str_hash_chain(f"t_{t}", "hk", t) for t in ("start", "g1", "g2", "g3", "g4", "device", "traffic")]
    samp_body, samp_final = cte_stages("cs_samp", samp, merge_chains(tag_chains))

    # item pick: rank lineitems of sampled orders by xxhash64(l_partkey, 42-int)
    it_base = (
        "SELECT l_orderkey AS iok, l_partkey AS ipk FROM lineitem"
        f" WHERE l_orderkey IN (SELECT okey FROM {samp_final})"
    )
    it_chains: list[Chain] = [
        long_hash_chain("ihk", "ipk", 42) + int_hash_chain("irk", "42", "ihk")
    ]
    it_body, it_final = cte_stages("cs_it", it_base, merge_chains(it_chains))

    prods = f"""
        cs_itr AS (SELECT iok, ipk, {signed_sql('irk')} AS irks FROM {it_final}),
        cs_itn AS (SELECT iok, ipk, irks,
                          row_number() OVER (PARTITION BY iok ORDER BY irks) AS rn
                   FROM cs_itr),
        cs_prods AS (SELECT iok,
                            list(CAST(ipk AS VARCHAR)
                                 ORDER BY irks, CAST(ipk AS VARCHAR)) AS products
                     FROM cs_itn WHERE rn <= 3 GROUP BY iok)
    """

    # derived per-session values (plain arithmetic over the tag uniforms)
    fb = f"""
        cs_fb AS (
            SELECT s.*,
                   COALESCE(p.products, []) AS products,
                   len(COALESCE(p.products, [])) AS np,
                   (600 + CAST(floor({uniform_sql('t_start')} * 1800) AS BIGINT)) AS start_off,
                   {_gap_sql(uniform_sql('t_g1'))} AS g1v,
                   {_gap_sql(uniform_sql('t_g2'))} AS g2v,
                   {_gap_sql(uniform_sql('t_g3'))} AS g3v,
                   {_gap_sql(uniform_sql('t_g4'))} AS g4v,
                   {_pick_sql(uniform_sql('t_device'), DEVICES, 3)} AS device_type,
                   {_pick_sql(uniform_sql('t_traffic'), TRAFFIC, 5)} AS traffic_source
            FROM {samp_final} s LEFT JOIN cs_prods p ON s.okey = p.iok
        ),
        cs_fb2 AS (
            SELECT *,
                   'fs-' || CAST(okey AS VARCHAR) AS session_id,
                   CAST(ck AS VARCHAR) AS customer_id,
                   pts - to_seconds(start_off) AS sstart,
                   (g1v + np * g2v + g3v) AS t_cart
            FROM cs_fb
        )
    """

    funnel_events = f"""
        cs_fview AS (
            SELECT *, unnest(generate_series(1, np)) AS vi FROM cs_fb2
        ),
        cs_fev AS (
            SELECT session_id, customer_id, device_type, traffic_source,
                   1 AS is_authenticated, 'page_view' AS event_type,
                   sstart AS event_ts, '' AS product_id, '' AS order_id
            FROM cs_fb2
            UNION ALL
            SELECT session_id, customer_id, device_type, traffic_source,
                   1, 'view_product',
                   sstart + to_seconds(g1v + (vi - 1) * g2v),
                   products[vi], ''
            FROM cs_fview
            UNION ALL
            SELECT session_id, customer_id, device_type, traffic_source,
                   1, 'add_to_cart', sstart + to_seconds(t_cart), '', ''
            FROM cs_fb2
            UNION ALL
            SELECT session_id, customer_id, device_type, traffic_source,
                   1, 'checkout', sstart + to_seconds(t_cart + g4v), '', ''
            FROM cs_fb2
            UNION ALL
            SELECT session_id, customer_id, device_type, traffic_source,
                   1, 'purchase', pts, '', CAST(okey AS VARCHAR)
            FROM cs_fb2
        )
    """

    # ---- browsing sessions ----------------------------------------------
    po_base = "SELECT o_orderkey AS bok, o_custkey AS bck, o_orderdate AS bod FROM orders"
    po_chains: list[Chain] = [
        long_hash_chain("bhk", "bok", 42) + int_hash_chain("brk", "42", "bhk")
    ]
    po_body, po_final = cte_stages("cs_po", po_base, merge_chains(po_chains))

    pool = f"""
        cs_pool AS (SELECT bok, bck, bod FROM {po_final}
                    ORDER BY {signed_sql('brk')}, bok LIMIT {NUM_BROWSING_SESSIONS}),
        cs_pooln AS (SELECT *, row_number() OVER (ORDER BY bok) - 1 AS bidx FROM cs_pool)
    """

    # sessions 0..N-1: base pick via pmod(xxhash64(sid, 'base'), pool_size)
    sess_base = f"SELECT range AS sid FROM range({NUM_BROWSING_SESSIONS})"
    sess_chains: list[Chain] = [
        long_hash_chain("sbh", "sid", 42) + str_hash_chain("sbb", "sbh", "base"),
    ]
    sess_body, sess_final = cte_stages("cs_sess", sess_base, merge_chains(sess_chains))

    joined = f"""
        cs_pc AS (SELECT COUNT(*) AS pn FROM cs_pooln),
        cs_sessb AS (
            SELECT s.*, (({signed_sql('sbb')}) % c.pn + c.pn) % c.pn AS bket
            FROM {sess_final} s CROSS JOIN cs_pc c
        ),
        cs_bj AS (
            SELECT s.sid, s.sbh, p.bck, p.bod
            FROM cs_sessb s JOIN cs_pooln p ON s.bket = p.bidx
        )
    """
    # per-session uniforms chained on sbh = hashLong(sid, 42)
    bs_chains = [str_hash_chain(f"b_{t}", "sbh", t) for t in ("auth", "n", "days", "device", "traffic")]
    bj_body, bj_final = cte_stages("cs_bjc", "SELECT * FROM cs_bj", merge_chains(bs_chains))

    bb = f"""
        cs_bb AS (
            SELECT *,
                   CASE WHEN {uniform_sql('b_auth')} < 0.4 THEN 1 ELSE 0 END AS is_authenticated,
                   (2 + CAST(floor({uniform_sql('b_n')} * 5) AS INT)) AS n_events,
                   bod - to_seconds(86400 + CAST(floor({uniform_sql('b_days')} * 59 * 86400) AS BIGINT)) AS bstart,
                   {_pick_sql(uniform_sql('b_device'), DEVICES, 3)} AS device_type,
                   {_pick_sql(uniform_sql('b_traffic'), TRAFFIC, 5)} AS traffic_source
            FROM {bj_final}
        ),
        cs_bex AS (
            SELECT *, unnest(generate_series(0, n_events - 1)) AS ei FROM cs_bb
        )
    """
    # per-event: inner = xxhash64(sid, ei-int) == hashInt(ei, sbh); the
    # uniforms then hash the inner value as a LONG COLUMN — _uniform's
    # xxhash64(key, tag) applies hashLong(key, 42) before the tag bytes
    ev_chains: list[Chain] = [
        int_hash_chain("beh", "ei", "sbh")
        + long_hash_chain("behl", "beh", 42)
        + str_hash_chain("b_w", "behl", "w")
        + str_hash_chain("b_g", "behl", "g"),
    ]
    bev_body, bev_final = cte_stages("cs_bev", "SELECT * FROM cs_bex", merge_chains(ev_chains))

    browsing_events = f"""
        cs_bfin AS (
            SELECT 'bs-' || CAST(sid AS VARCHAR) AS session_id,
                   CASE WHEN is_authenticated = 1 THEN CAST(bck AS VARCHAR) ELSE '' END AS customer_id,
                   device_type, traffic_source, is_authenticated,
                   CASE WHEN {uniform_sql('b_w')} < 0.40 THEN 'page_view'
                        WHEN {uniform_sql('b_w')} < 0.75 THEN 'view_product'
                        ELSE 'add_to_cart' END AS event_type,
                   bstart + to_seconds(ei * {_gap_sql(uniform_sql('b_g'))}) AS event_ts,
                   '' AS product_id, '' AS order_id
            FROM {bev_final}
        )
    """

    final = """
        cs_all AS (
            SELECT session_id, customer_id, device_type, traffic_source,
                   is_authenticated, event_type, event_ts, product_id, order_id
            FROM cs_fev
            UNION ALL
            SELECT session_id, customer_id, device_type, traffic_source,
                   is_authenticated, event_type, event_ts, product_id, order_id
            FROM cs_bfin
        ),
        cs_events AS MATERIALIZED (
            SELECT md5(concat_ws('|', session_id, event_type,
                                 CAST(event_ts AS VARCHAR), product_id)) AS event_id,
                   session_id, customer_id, event_type, event_ts,
                   product_id, order_id, device_type, traffic_source,
                   is_authenticated,
                   CAST(event_ts AS DATE) AS event_date
            FROM cs_all
        )
    """

    body = ",\n".join(
        [fo_body, samp_body, it_body, prods.strip(), fb.strip(), funnel_events.strip(),
         po_body, pool.strip(), sess_body, joined.strip(), bj_body, bb.strip(),
         bev_body, browsing_events.strip(), final.strip()]
    )
    return body, "cs_events"


def clickstream_generate_oracle() -> str:
    body, ev = clickstream_events_sql()
    return f"WITH {body} SELECT * FROM {ev} ORDER BY event_ts, event_id"


def clickstream_funnel_oracle() -> str:
    body, ev = clickstream_events_sql()
    return f"""WITH {body}
        SELECT event_type, COUNT(DISTINCT session_id) AS sessions
        FROM {ev}
        GROUP BY event_type
        ORDER BY sessions DESC, event_type"""


def clickstream_conversion_oracle() -> str:
    body, ev = clickstream_events_sql()
    return f"""WITH {body},
        cs_purch AS (SELECT DISTINCT session_id AS p_session_id
                     FROM {ev} WHERE event_type = 'purchase')
        SELECT e.traffic_source,
               COUNT(DISTINCT e.session_id) AS sessions,
               COUNT(DISTINCT p.p_session_id) AS purchase_sessions,
               ROUND(100.0 * COUNT(DISTINCT p.p_session_id)
                     / COUNT(DISTINCT e.session_id), 4) AS conversion_rate_pct
        FROM {ev} e LEFT JOIN cs_purch p ON e.session_id = p.p_session_id
        GROUP BY e.traffic_source
        ORDER BY e.traffic_source"""
