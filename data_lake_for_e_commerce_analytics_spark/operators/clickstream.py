"""Clickstream synthesis as a pure Spark dataflow (pipeline G6,
generate_clickstream.py:20-276).

The reference builds funnel sessions in a row-at-a-time Python loop
(generate_clickstream.py:115-197): per delivered order, emit
page_view -> <=3 view_product -> add_to_cart -> checkout -> purchase,
with the purchase carrying the real order id at the real purchase time;
plus N non-converting browsing sessions of 2-6 weighted-random events
(generate_clickstream.py:209-261).

Set-based rewrite: each session is ONE row holding an array of event
structs, then ``explode`` flattens to the event table — no Python loop,
no UDF, linear in |orders|. Randomness is xxhash64-derived (uniform per
(key, tag)), so output is deterministic across runs AND partition
layouts — stronger than the reference, which seeds only its top-level
sample (generate_clickstream.py:133 passes random_state=None).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .sampling import dense_index, exact_n_sample_by_key, per_group_sample

EVENT_TYPES_FUNNEL = ("page_view", "view_product", "add_to_cart", "checkout", "purchase")
DEVICE_TYPES = ("desktop", "mobile", "tablet")
TRAFFIC_SOURCES = ("direct", "seo", "ads", "email", "social")


def _uniform(key: Column, tag: str) -> Column:
    """Deterministic uniform in [0,1) derived from xxhash64(key, tag):
    the engine's reproducible replacement for random.random()."""
    h = F.xxhash64(key, F.lit(tag))
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double")) / F.lit(1_000_000_007.0)


def _pick(key: Column, tag: str, values: tuple[str, ...]) -> Column:
    """Uniform categorical choice (R4, generate_clickstream.py:128-129)."""
    arr = F.array(*[F.lit(v) for v in values])
    idx = (_uniform(key, tag) * len(values)).cast("int") + 1
    return F.element_at(arr, F.least(idx, F.lit(len(values))))


def _event(
    etype: Column | str,
    ts: Column,
    product_id: Column | None = None,
    order_id: Column | None = None,
) -> Column:
    null_str = F.lit(None).cast("string")
    return F.struct(
        (F.lit(etype) if isinstance(etype, str) else etype).alias("event_type"),
        ts.alias("event_ts"),
        (product_id if product_id is not None else null_str).alias("product_id"),
        (order_id if order_id is not None else null_str).alias("order_id"),
    )


def funnel_sessions(
    orders: DataFrame,
    lineitem: DataFrame,
    max_sessions: int = 10_000,
    delivered_status: str = "F",
    max_items: int = 3,
) -> DataFrame:
    """Funnel sessions from delivered orders: one row per order with the
    5-7 event structs of generate_clickstream.py:139-194, exploded.

    Dataflow: filter delivered (P5) -> deterministic exact-n sample (R1)
    -> per-order <=3 item sample via window (R2) -> collect_list per
    order (the set-based rewrite of the reference's per-order loop) ->
    build struct array -> explode. Shuffles: the item window + group-by
    (both keyed on the order key) and the sample's TakeOrdered.
    """
    delivered = orders.filter(F.col("o_orderstatus") == delivered_status)
    sampled = exact_n_sample_by_key(delivered, max_sessions, "o_orderkey")

    # Restrict lineitem to the sampled orders BEFORE the per-group window:
    # the sampled key set is max_sessions rows (broadcastable), so the
    # semi join prunes the item table map-side and the window shuffles
    # only ~max_sessions x items_per_order rows — not the full table.
    sampled_keys = sampled.select(F.col("o_orderkey").alias("l_orderkey"))
    items = per_group_sample(
        lineitem.select("l_orderkey", "l_partkey").join(
            F.broadcast(sampled_keys), "l_orderkey", "left_semi"
        ),
        "l_orderkey",
        max_items,
        order_key="l_partkey",
    )
    # Deterministic list order BY CONSTRUCTION: collect_list alone
    # yields arrival order, which follows the window sort on most plans
    # but is not guaranteed (observed flipping for one group when the
    # downstream plan changes) and would silently vary with partition
    # layout on a real cluster. Sorting (rank, pid) structs pins the
    # sequence to the same hash rank the per-group sample used,
    # independent of physical execution.
    order_items = items.groupBy("l_orderkey").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.xxhash64(F.col("l_partkey"), F.lit(42)).alias("rk"),
                        F.col("l_partkey").cast("string").alias("pid"),
                    )
                )
            ),
            lambda s: s["pid"],
        ).alias("product_ids")
    )

    base = sampled.join(order_items, sampled.o_orderkey == order_items.l_orderkey, "left")
    okey = F.col("o_orderkey")
    purchase_ts = F.col("o_orderdate").cast("timestamp")
    # Session starts 10-40 min before the purchase; the worst-case sum of
    # intra-session gaps below (<=360 s) stays under the 600 s minimum, so
    # every pre-purchase event precedes the pinned purchase timestamp.
    start_offset_s = (F.lit(600) + (_uniform(okey, "start") * 1800).cast("long")).cast("long")
    session_start = F.timestamp_add("SECOND", -start_offset_s, purchase_ts)
    products = F.coalesce(F.col("product_ids"), F.array().cast("array<string>"))

    def gap(tag: str) -> Column:
        # 5-60 s between events (generate_clickstream.py:148/:161/:173).
        return (F.lit(5) + (_uniform(okey, tag) * 55).cast("long")).cast("long")

    t_view0 = gap("g1")
    view_events = F.transform(
        products,
        lambda pid, i: _event(
            "view_product",
            F.timestamp_add(
                "SECOND", (t_view0 + i.cast("long") * gap("g2")).cast("long"), session_start
            ),
            product_id=pid,
        ),
    )
    t_cart = t_view0 + F.size(products).cast("long") * gap("g2") + gap("g3")
    t_checkout = t_cart + gap("g4")
    events_arr = F.concat(
        F.array(_event("page_view", session_start)),
        view_events,
        F.array(
            _event("add_to_cart", F.timestamp_add("SECOND", t_cart, session_start)),
            _event("checkout", F.timestamp_add("SECOND", t_checkout, session_start)),
            # Purchase pinned at the REAL order timestamp with the REAL
            # order id (generate_clickstream.py:186-194) — referential
            # integrity by construction.
            _event("purchase", purchase_ts, order_id=okey.cast("string")),
        ),
    )

    session = base.select(
        F.concat(F.lit("fs-"), okey.cast("string")).alias("session_id"),
        F.col("o_custkey").cast("string").alias("customer_id"),
        _pick(okey, "device", DEVICE_TYPES).alias("device_type"),
        _pick(okey, "traffic", TRAFFIC_SOURCES).alias("traffic_source"),
        F.lit(1).alias("is_authenticated"),
        F.explode(events_arr).alias("e"),
    )
    return _flatten(session)


def browsing_sessions(
    orders: DataFrame,
    num_sessions: int = 8_000,
    broadcast_pool_max: int = 4_000_000,
) -> DataFrame:
    """Non-converting browsing sessions (generate_clickstream.py:209-261):
    2-6 weighted-random events (0.4/0.35/0.25 page_view/view_product/
    add_to_cart, py:238-247), 40% authenticated (py:219), never
    checkout/purchase.

    spark.range(num_sessions) seeds the dataflow. The base customer/
    timestamp row is drawn from a bounded pool (deterministic sample of
    <= num_sessions orders), so the index window ranks only the pool —
    never a global window over the full orders table.

    The session->pool join is an equi-join on the hashed index, so BOTH
    strategies are available: the pool broadcasts while it fits
    (``pool_size <= broadcast_pool_max``, ~30 B/row so the default caps
    the build side near 120 MB), and past that the SAME key becomes a
    shuffle join — a 10^8-session run cannot broadcast a 10^8-row pool,
    and without the switch the planner would be forced to ship it to
    every executor or fall over. Join strategy changes, values don't:
    the key is deterministic either way (plan + equality pinned in
    tests/test_clickstream.py).
    """
    spark = orders.sparkSession
    pool = exact_n_sample_by_key(
        orders.select("o_orderkey", "o_custkey", "o_orderdate"), num_sessions, "o_orderkey"
    )
    # Distributed dense index (no global single-partition window): the
    # pool is bounded by num_sessions, but index it the way that also
    # holds if a caller asks for 10^8 sessions on a real cluster.
    pool_indexed = dense_index(pool, "o_orderkey")
    pool_size = pool_indexed.count()

    sessions = spark.range(num_sessions).withColumnRenamed("id", "sid")
    skey = F.col("sid")
    keyed = sessions.withColumn(
        "__idx", F.pmod(F.xxhash64(skey, F.lit("base")), F.lit(pool_size))
    )
    right = (
        F.broadcast(pool_indexed)
        if pool_size <= broadcast_pool_max
        else pool_indexed
    )
    joined = keyed.join(right, "__idx", "inner")

    is_auth = (_uniform(skey, "auth") < 0.4).cast("int")
    n_events = F.lit(2) + (_uniform(skey, "n") * 5).cast("int")
    # Session happens 1-60 days before the base order (py:211-214).
    start = F.timestamp_add(
        "SECOND",
        -(F.lit(86400) + (_uniform(skey, "days") * 59 * 86400).cast("long")),
        F.col("o_orderdate").cast("timestamp"),
    )

    events_arr = F.transform(
        F.sequence(F.lit(0), n_events - 1),
        lambda i: _event(
            # weighted branch (R5) keyed per (session, event index)
            F.when(_uniform(F.xxhash64(skey, i), "w") < 0.40, "page_view")
            .when(_uniform(F.xxhash64(skey, i), "w") < 0.75, "view_product")
            .otherwise("add_to_cart"),
            F.timestamp_add(
                "SECOND",
                i.cast("long")
                * (F.lit(5) + (_uniform(F.xxhash64(skey, i), "g") * 55).cast("long")),
                start,
            ),
        ),
    )

    session = joined.select(
        F.concat(F.lit("bs-"), skey.cast("string")).alias("session_id"),
        # Unauthenticated sessions carry EMPTY-STRING ids, not NULL
        # (generate_clickstream.py:99-108; SURVEY.md §7.4 hard part 4).
        F.when(is_auth == 1, F.col("o_custkey").cast("string")).otherwise(F.lit("")).alias("customer_id"),
        _pick(skey, "device", DEVICE_TYPES).alias("device_type"),
        _pick(skey, "traffic", TRAFFIC_SOURCES).alias("traffic_source"),
        is_auth.alias("is_authenticated"),
        F.explode(events_arr).alias("e"),
    )
    return _flatten(session)


def _flatten(session: DataFrame) -> DataFrame:
    """Project the exploded event struct to the 13-column clickstream
    schema (reference README.md:227-244, FIXTURES.md §B). event_id is a
    deterministic digest of the event's identity (the reference uses
    uuid4, generate_clickstream.py:97 — we trade that for reproducibility)."""
    return session.select(
        F.md5(
            F.concat_ws(
                "|",
                F.col("session_id"),
                F.col("e.event_type"),
                F.col("e.event_ts").cast("string"),
                F.coalesce(F.col("e.product_id"), F.lit("")),
            )
        ).alias("event_id"),
        "session_id",
        "customer_id",
        F.col("e.event_type").alias("event_type"),
        F.col("e.event_ts").alias("event_ts"),
        F.coalesce(F.col("e.product_id"), F.lit("")).alias("product_id"),
        F.coalesce(F.col("e.order_id"), F.lit("")).alias("order_id"),
        "device_type",
        "traffic_source",
        "is_authenticated",
        F.to_date("e.event_ts").alias("event_date"),
    )


def generate_clickstream(
    spark: SparkSession,
    orders: DataFrame,
    lineitem: DataFrame,
    max_purchase_sessions: int = 10_000,
    num_browsing_sessions: int = 8_000,
    time_sorted: bool = True,
) -> DataFrame:
    """Full G6 pipeline: funnel + browsing sessions, unioned (U1) and
    globally time-ordered (O3, generate_clickstream.py:272-273).

    ``time_sorted=False`` skips the final range-partitioned sort — the
    right call when the output feeds an aggregation (the sort is a full
    extra shuffle that any downstream groupBy immediately destroys);
    keep it True only for ordered sinks."""
    funnel = funnel_sessions(orders, lineitem, max_sessions=max_purchase_sessions)
    browsing = browsing_sessions(orders, num_sessions=num_browsing_sessions)
    unioned = funnel.unionByName(browsing)
    return unioned.orderBy("event_ts", "event_id") if time_sorted else unioned
