"""URL-level corpus curation: canonicalization, canonical-URL dedup,
and host-level aggregation — the web-crawl ingestion steps (C4 /
RefinedWeb style) that run BEFORE text-level dedup: a crawl sees the
same page under utm-tagged, fragment-bearing, case-mangled, www- and
default-port-variant URLs, and URL dedup collapses those for free
before any text is compared.

The lake's ``documents`` table carries no URL column, so
``synth_urls`` derives a deterministic messy URL per document (same
discipline as the clickstream synthesizer: every messiness choice is a
bit of ``xxhash64(doc_id, 'url')``, so any engine replays the exact
string — the DuckDB oracle regenerates both the messy URL and its
canonical form independently).

Design for 100 TB:
- Canonicalization is pure per-row string expression work — whole-stage
  codegen, no shuffle, runs at scan speed.
- Canonical-URL dedup groups on the md5 DIGEST of the canonical URL, so
  the shuffle carries 16-byte keys + ids, never URL strings (same rule
  as the text fingerprint dedup family).
- Host aggregation is a partial-agg groupBy on the (short,
  low-cardinality) host key; blocklist filtering is a broadcast
  left-anti join on host.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query parameters that never survive canonicalization (tracking).
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref)(=|$)"


def synth_urls(documents: DataFrame) -> DataFrame:
    """One deterministic messy URL per document.

    All variation comes from ``u = pmod(xxhash64(doc_id, 'url'), 1024)``
    bit fields: scheme case, host case, ``www.`` prefix, port
    (``:8080`` kept / ``:443`` default / none), trailing slash,
    ``#s<k>`` fragment, an optional ``utm_source`` tracking param, an
    always-on ``fbclid`` tracking param, and query-param order. The
    item path segment is ``doc_id % 50`` — distinct documents
    intentionally share canonical URLs (republished pages), giving the
    canonical dedup real work.
    """
    u = F.pmod(F.xxhash64(F.col("doc_id"), F.lit("url")), F.lit(1024))
    b0 = u % 2  # scheme upper-cased
    b1 = (u / 2).cast("long") % 2  # host upper-cased
    b2 = (u / 4).cast("long") % 2  # www. prefix
    psel = (u / 8).cast("long") % 8  # 0 -> :8080, 1|2 -> :443, else none
    b6 = (u / 64).cast("long") % 2  # trailing slash
    b7 = (u / 128).cast("long") % 2  # fragment
    b8 = (u / 256).cast("long") % 2  # utm_source param
    b9 = (u / 512).cast("long") % 2  # reversed param order
    item = F.col("doc_id") % 50
    page = item % 7
    frag = F.pmod(F.xxhash64(F.col("doc_id"), F.lit("url")), F.lit(5))

    scheme = F.when(b0 == 1, F.lit("HTTPS")).otherwise(F.lit("https"))
    host_lower = F.concat(F.lit("shop-"), F.col("source"), F.lit(".example.com"))
    host = F.when(b1 == 1, F.upper(host_lower)).otherwise(host_lower)
    www = F.when(b2 == 1, F.lit("www.")).otherwise(F.lit(""))
    port = (
        F.when(psel == 0, F.lit(":8080"))
        .when(psel.isin(1, 2), F.lit(":443"))
        .otherwise(F.lit(""))
    )
    path = F.concat(
        F.lit("/"), F.col("lang"), F.lit("/item/"), item.cast("string"),
        F.when(b6 == 1, F.lit("/")).otherwise(F.lit("")),
    )
    page_p = F.concat(F.lit("page="), page.cast("string"))
    sort_p = F.lit("sort=price")
    utm_p = F.lit("utm_source=news")
    fb_p = F.concat(F.lit("fbclid=x"), frag.cast("string"))
    params = F.array(page_p, sort_p)
    params = F.when(b8 == 1, F.concat(params, F.array(utm_p))).otherwise(params)
    params = F.concat(params, F.array(fb_p))
    query = F.array_join(
        F.when(b9 == 1, F.reverse(params)).otherwise(params), "&"
    )
    fragment = F.when(b7 == 1, F.concat(F.lit("#s"), frag.cast("string"))).otherwise(
        F.lit("")
    )
    url = F.concat(scheme, F.lit("://"), www, host, port, path, F.lit("?"), query, fragment)
    return documents.select("doc_id", "lang", "source", url.alias("url"))


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of an arbitrary http(s) URL, as one per-row
    expression tree (no UDF, no shuffle):

    - scheme and host lower-cased; a leading ``www.`` stripped
    - userinfo (``user:pass@``) dropped from the authority
    - default ports dropped (``:80`` for http, ``:443`` for https);
      non-default ports kept
    - the fragment dropped
    - tracking query params dropped (``TRACKING_PARAM_RE``: utm_*,
      fbclid, gclid, msclkid, ref); surviving params sorted by name so
      parameter order never splits a page identity
    - trailing slashes stripped from the path

    Every regex used is in the Java∩RE2 dialect intersection (same rule
    as the PII scrubber) so the DuckDB oracle replays it verbatim.
    """
    url = F.col(url) if isinstance(url, str) else url
    no_frag = F.regexp_replace(url, "#.*", "")
    scheme = F.lower(F.regexp_extract(no_frag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(no_frag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    # userinfo never identifies a page; strip it before host parsing
    rest = F.regexp_replace(rest, "^[^/?@]*@", "")
    hostport = F.regexp_extract(rest, "^([^/?]*)", 1)
    pathq = F.regexp_replace(rest, "^[^/?]*", "")
    host = F.regexp_replace(
        F.lower(F.regexp_replace(hostport, ":[0-9]+$", "")), r"^www\.", ""
    )
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = F.regexp_replace(F.regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    query = F.regexp_extract(pathq, r"\?(.*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    canon_q = F.array_join(F.array_sort(kept), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit("")),
    )


def url_host(url: Column | str) -> Column:
    """The canonical host of a URL (lower-cased, www- and port-stripped)."""
    url = F.col(url) if isinstance(url, str) else url
    rest = F.regexp_replace(
        F.regexp_replace(url, "#.*", ""), "^[A-Za-z][A-Za-z0-9+.-]*://", ""
    )
    rest = F.regexp_replace(rest, "^[^/?@]*@", "")
    hostport = F.regexp_extract(rest, "^([^/?]*)", 1)
    return F.regexp_replace(
        F.lower(F.regexp_replace(hostport, ":[0-9]+$", "")), r"^www\.", ""
    )


def with_canonical(urls: DataFrame) -> DataFrame:
    """Attach ``canon_url`` and ``host`` to a (doc_id, url) relation."""
    return urls.withColumn("canon_url", canonicalize_url("url")).withColumn(
        "host", url_host("url")
    )


def url_dedup(urls: DataFrame) -> DataFrame:
    """Canonical-URL dedup: one keeper (min doc_id) per canonical URL,
    with the duplicate-group size. Groups on the md5 digest of the
    canonical URL so the shuffle moves 16-byte keys, and re-attaches the
    canonical string from the keeper row itself (min-struct election —
    no second join against the corpus)."""
    canon = urls.withColumn("canon_url", canonicalize_url("url"))
    return (
        canon.select(F.md5("canon_url").alias("ck"), "doc_id", "canon_url")
        .groupBy("ck")
        .agg(
            F.min(F.struct("doc_id", "canon_url")).alias("keep"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select(
            F.col("keep.doc_id").alias("doc_id"),
            F.col("keep.canon_url").alias("canon_url"),
            "n_dups",
        )
    )


def host_stats(urls: DataFrame) -> DataFrame:
    """Per-host crawl profile: document count, distinct canonical pages,
    distinct languages seen, and the keeper id — the relation a crawl
    operator ranks and blocklists hosts from."""
    c = with_canonical(urls)
    return c.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("canon_url").alias("n_pages"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("doc_id").alias("first_doc_id"),
    )


def host_blocklist_filter(urls: DataFrame, blocked: DataFrame) -> DataFrame:
    """Drop every document whose canonical host appears in the blocklist
    (a ``host``-column relation). Broadcast left-anti join — the
    blocklist is human-curated and tiny next to the corpus."""
    c = urls.withColumn("host", url_host("url"))
    return c.join(F.broadcast(blocked.select("host")), "host", "left_anti")


def url_seen_index(urls: DataFrame) -> DataFrame:
    """The standing crawl index: the distinct md5 digests of every
    canonical URL ever kept. 16 bytes per page — the smallest possible
    state for exactly-once crawl ingestion."""
    return (
        urls.select(F.md5(canonicalize_url("url")).alias("ck")).distinct()
    )


def url_incremental_dedup(new_urls: DataFrame, seen: DataFrame) -> DataFrame:
    """Dedup an ingest batch of (doc_id, url) rows against a standing
    seen-URL index WITHOUT touching the indexed corpus: one verdict row
    per new doc — ``kept`` | ``dup_in_batch`` (same canonical URL
    arrived together, non-first loses) | ``seen`` (canonical URL already
    in the index).

    Scale shape (same discipline as ``dedup.incremental_dedup_frames``):
    the index is probed with an INNER join against the batch side, and
    the hit set (bounded by the batch) feeds a left join for the
    verdict. Neither side carries a broadcast HINT (VERDICT r10
    screen): the batch is small by contract in incremental ingest, so
    AQE broadcasts it at runtime from its measured size — while a
    backfill-sized batch degrades gracefully to a shuffle join instead
    of OOMing executors on a forced fact-cardinality broadcast. The
    index is never the build side either way. The distinct on the hit
    set makes the verdict immune to duplicate index rows — e.g. the
    compaction both-state a crashed compact_epoch_files retry leaves
    until it finishes.
    """
    keyed = new_urls.select(
        "doc_id", F.md5(canonicalize_url("url")).alias("ck"),
        canonicalize_url("url").alias("canon_url"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("ck").orderBy("doc_id")
    ranked = keyed.withColumn("__rn", F.row_number().over(w))
    firsts = ranked.filter(F.col("__rn") == 1).select("doc_id", "ck")
    hits = (
        seen.select("ck")
        .join(firsts, "ck")
        .select("doc_id")
        .distinct()
        .withColumn("__seen", F.lit(1))
    )
    return (
        ranked.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "canon_url",
            F.when(F.col("__rn") > 1, F.lit("dup_in_batch"))
            .when(F.col("__seen").isNotNull(), F.lit("seen"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )


def host_quality_profile(
    documents: DataFrame, ensemble: DataFrame | None = None
) -> DataFrame:
    """The crawl-policy table a web curation stack actually ranks hosts
    by: per host, document volume, how many documents the Gopher gate
    keeps, the mean rank-fusion quality of its documents
    (``text.quality_ensemble``), and the host's link authority
    (``graph.host_authority``) — text quality and graph authority are
    the two incommensurable priors RefinedWeb-style pipelines fuse.

    Exactness rule: the per-host mean sums the ensemble score in
    integer basis points (the score is already rounded to 4 decimals,
    so ``round(s*10^4)`` is exact) and rounds half-up with INTEGER
    arithmetic (``(2*sum + n) div (2*n)``) — summation order can never
    move the 4th decimal and no engine-specific float ROUND mode
    (half-up vs half-even) can flip an exact .5 boundary.

    Scale: one doc->host projection (scan speed), one partial-agg
    groupBy on the low-cardinality host key, one broadcast join against
    the |hosts|-row authority relation. ``ensemble`` accepts a
    precomputed (possibly cached) ``text.quality_ensemble`` result so a
    session that also serves the standalone ensemble query shares one
    materialization — the silver-zone pattern: at 100 TB the ensemble
    is written once and every consumer scans it.
    """
    from .graph import host_authority
    from .text import quality_ensemble

    ens = ensemble if ensemble is not None else quality_ensemble(documents)
    u = synth_urls(documents).select("doc_id", url_host("url").alias("host"))
    per_host = (
        u.join(ens, "doc_id")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("keep").cast("long").alias("n_kept"),
            F.sum(F.round(F.col("ensemble") * 10000).cast("long")).alias("__ebp"),
        )
        .select(
            "host",
            "n_docs",
            "n_kept",
            (F.expr("(2 * __ebp + n_docs) div (2 * n_docs)") / F.lit(10000.0))
            .alias("mean_ensemble"),
        )
    )
    auth = host_authority(synth_urls(documents)).withColumnRenamed("node", "host")
    return per_host.join(F.broadcast(auth), "host").withColumnRenamed(
        "pr", "authority_pr"
    )
