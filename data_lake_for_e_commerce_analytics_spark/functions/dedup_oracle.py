"""DuckDB oracles for the PRODUCTION (xxhash64) near-dup paths —
operators/dedup.py's minhash_lsh_pairs and simhash fingerprints —
replayed hash-for-hash via the portable XXH64 chains.

Round 2 gave these families md5-portable twins (minhash_pairs_md5,
simhash_pairs_md5); with blob_hash_chain (arbitrary-length string
XXH64 in SQL) the fast paths themselves become value-checkable: token
hashes, rolling shingle folds, seed signatures, band buckets, and
fingerprint bit votes all reproduce bit-for-bit.
"""

from __future__ import annotations

from .xxh64_sql import (
    Chain,
    blob_hash_chain,
    cte_stages,
    int_hash_chain,
    long_hash_chain,
    merge_chains,
    signed_sql,
)

NUM_HASHES = 32
BANDS = 8
SHINGLE_N = 3
JACCARD_THRESHOLD = 0.5


def _token_hash_ctes() -> str:
    """CTE block: documents -> (doc_id, thv) with thv = per-token
    xxhash64 longs in token order (dedup.token_hashes)."""
    tok_base = r"""
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS t,
               unnest(generate_series(1, len(regexp_split_to_array(trim(text), '\s+')))) AS pos
        FROM documents
    """
    body, final = cte_stages(
        "dk_tok", tok_base, merge_chains([blob_hash_chain("th", "encode(t)")])
    )
    return f"""{body},
        dk_thv AS MATERIALIZED (
            SELECT doc_id, list({signed_sql('th')} ORDER BY pos) AS thv
            FROM {final} GROUP BY doc_id
        )"""


def _shingle_ctes() -> str:
    """CTE block: (doc_id, thv) -> (doc_id, sh) with sh = distinct
    rolling-fold shingle longs (dedup.rolling_shingles, n=3): shingle_i
    folds thv[i], thv[i+1], thv[i+2] through xxhash64(acc, next) with
    NULL-padding keeping the partial fold for short documents."""
    # project h1/h2/h3 immediately and DROP the token-hash list — the
    # chain stages SELECT *, so a carried 200-element list would be
    # copied through every stage
    base = f"""
        SELECT doc_id, thv[i] AS h1, thv[i + 1] AS h2, thv[i + 2] AS h3
        FROM (
            SELECT doc_id, thv,
                   unnest(generate_series(1, greatest(len(thv) - {SHINGLE_N - 1}, 1))) AS i
            FROM dk_thv
        )
    """
    # acc1 = xxhash64(h1, h2) = hashLong(h2, hashLong(h1, 42)); NULL h2 keeps h1
    chain: Chain = long_hash_chain("sa", "h1", 42)
    chain += long_hash_chain("sb", "h2", "sa")
    chain += [("acc1", f"CASE WHEN h2 IS NULL THEN h1 ELSE {signed_sql('sb')} END")]
    chain += long_hash_chain("sc", "acc1", 42)
    chain += long_hash_chain("sd", "h3", "sc")
    chain += [("shingle", f"CASE WHEN h3 IS NULL THEN acc1 ELSE {signed_sql('sd')} END")]
    body, final = cte_stages("dk_shr", base, merge_chains([chain]))
    return f"""{body},
        dk_sh AS MATERIALIZED (
            SELECT doc_id, list_distinct(list(shingle)) AS sh
            FROM {final} GROUP BY doc_id
        )"""


def _signature_ctes(num_hashes: int = NUM_HASHES) -> str:
    """CTE block: (doc_id, sh) -> (doc_id, sh, sig0..sigN-1) with
    sig_s = min over shingles of xxhash64(shingle, lit(s)-int)
    (dedup.minhash_signatures)."""
    base = "SELECT doc_id, unnest(sh) AS shl FROM dk_sh"
    body1, final1 = cte_stages(
        "dk_sig", base, merge_chains([long_hash_chain("sg", "shl", 42)])
    )
    # one generic seed chain over (doc, shingle) x seed ROWS — a single
    # 8-step chain instead of 32 parallel 8-step column chains, and the
    # row explosion lets the engine spread the arithmetic across threads
    body2, final2 = cte_stages(
        "dk_sig2",
        f"SELECT doc_id, sg, unnest(generate_series(0, {num_hashes - 1})) AS s FROM {final1}",
        merge_chains([int_hash_chain("gh", "s", "sg")]),
    )
    return f"""{body1},
        {body2},
        dk_sigm AS (
            SELECT doc_id, s, min({signed_sql('gh')}) AS m
            FROM {final2} GROUP BY doc_id, s
        ),
        dk_sigs AS MATERIALIZED (
            SELECT doc_id, list(m ORDER BY s) AS sig FROM dk_sigm GROUP BY doc_id
        )"""


def _band_ctes(num_hashes: int = NUM_HASHES, bands: int = BANDS) -> str:
    """CTE block: signatures -> (doc_id, band_idx, band_hash) with
    band_hash = xxhash64 of the comma-joined signed signature slice
    (dedup.minhash_lsh_pairs's banding)."""
    rows = num_hashes // bands
    idx_arr = "[" + ", ".join(str(b) for b in range(bands)) + "]"
    str_arr = "[" + ", ".join(
        "concat_ws(',', "
        + ", ".join(f"CAST(sig[{b * rows + r + 1}] AS VARCHAR)" for r in range(rows))
        + ")"
        for b in range(bands)
    ) + "]"
    base = f"""
        SELECT doc_id, unnest({idx_arr}) AS band_idx, unnest({str_arr}) AS bstr
        FROM dk_sigs
    """
    body, final = cte_stages(
        "dk_band", base, merge_chains([blob_hash_chain("bh", "encode(bstr)")])
    )
    return f"""{body},
        dk_bands AS MATERIALIZED (
            SELECT doc_id, band_idx, {signed_sql('bh')} AS band_hash FROM {final}
        )"""


def simhash_histogram_oracle(max_hamming: int = 3, n_blocks: int = 4) -> str:
    """dedup.simhash_pair_histogram (multiprobe default) replayed: per
    DISTINCT token xxhash64, 64 bit votes, fingerprint sign rule,
    pigeonhole block join, exact Hamming filter, histogram."""
    width = 64 // n_blocks
    mask = (1 << width) - 1
    tok_base = r"""
        SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS t
        FROM documents
    """
    body, final = cte_stages(
        "sx_tok", tok_base, merge_chains([blob_hash_chain("sh", "encode(t)")])
    )
    votes = ", ".join(
        f"sum(CAST((sh >> {b}) & 1 AS BIGINT)) AS c{b}" for b in range(64)
    )
    fp_bits = " + ".join(
        f"(CASE WHEN 2 * c{b} > n THEN CAST({1 << b} AS HUGEINT) ELSE 0 END)"
        for b in range(64)
    )
    block_arr = "[" + ", ".join(str(i) for i in range(n_blocks)) + "]"
    val_arr = "[" + ", ".join(
        f"CAST((ufp >> {i * width}) & {mask} AS BIGINT)" for i in range(n_blocks)
    ) + "]"
    return f"""
        WITH {body},
        sx_votes AS (
            SELECT doc_id, count(*) AS n, {votes}
            FROM {final} GROUP BY doc_id
        ),
        sx_fp AS MATERIALIZED (
            SELECT doc_id, {signed_sql(f'({fp_bits})')} AS fp
            FROM sx_votes
        ),
        sx_blocks AS MATERIALIZED (
            SELECT doc_id, fp,
                   unnest({block_arr}) AS block_idx,
                   unnest({val_arr}) AS block_val
            FROM (SELECT doc_id, fp, ({_unsigned('fp')}) AS ufp FROM sx_fp)
        ),
        sx_pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.fp AS fp_a, b.fp AS fp_b
            FROM sx_blocks a
            JOIN sx_blocks b ON a.block_idx = b.block_idx AND a.block_val = b.block_val
            WHERE a.doc_id < b.doc_id
        )
        SELECT bit_count(xor(fp_a, fp_b)) AS hamming,
               COUNT(*) AS n_pairs,
               COUNT(DISTINCT doc_a) AS n_docs_as_keeper
        FROM sx_pairs
        WHERE bit_count(xor(fp_a, fp_b)) <= {max_hamming}
        GROUP BY hamming ORDER BY hamming
    """


def _unsigned(col: str) -> str:
    """Signed BIGINT -> unsigned 64-bit residue in HUGEINT."""
    return f"CAST({col} AS HUGEINT) & 18446744073709551615"


def minhash_pairs_oracle(threshold: float = JACCARD_THRESHOLD) -> str:
    return f"""
        WITH {_token_hash_ctes()},
        {_shingle_ctes()},
        {_signature_ctes()},
        {_band_ctes()},
        dk_cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM dk_bands a
            JOIN dk_bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
            WHERE a.doc_id < b.doc_id
        )
        SELECT c.doc_a, c.doc_b,
               ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                     / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))),
                     4) AS jaccard
        FROM dk_cand c
        JOIN dk_sh sa ON sa.doc_id = c.doc_a
        JOIN dk_sh sb ON sb.doc_id = c.doc_b
        WHERE ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                    / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))),
                    4) >= {threshold}
        ORDER BY doc_a, doc_b
    """


def incremental_dedup_oracle(
    min_agree: int = 16, num_hashes: int = NUM_HASHES
) -> str:
    """Replay of dedup.incremental_dedup_frames with the corpus split
    even/odd on doc_id (even = the persisted index, odd = the ingest
    batch): exact fingerprint probe, LSH band probe, signature-agreement
    verification, exact-over-near precedence, min-match election."""
    return f"""
        WITH {_token_hash_ctes()},
        {_shingle_ctes()},
        {_signature_ctes()},
        {_band_ctes()},
        fp AS (
            SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
            FROM documents
        ),
        newdocs AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 1),
        exact AS (
            SELECT n.doc_id, MIN(i.doc_id) AS exact_match
            FROM fp n JOIN fp i ON n.f = i.f
            WHERE n.doc_id % 2 = 1 AND i.doc_id % 2 = 0
            GROUP BY n.doc_id
        ),
        cand AS (
            SELECT DISTINCT n.doc_id AS doc_id, i.doc_id AS idx_doc
            FROM dk_bands n JOIN dk_bands i
              ON n.band_idx = i.band_idx AND n.band_hash = i.band_hash
            WHERE n.doc_id % 2 = 1 AND i.doc_id % 2 = 0
        ),
        near AS (
            SELECT c.doc_id, MIN(c.idx_doc) AS near_match
            FROM cand c
            JOIN dk_sigs a ON a.doc_id = c.doc_id
            JOIN dk_sigs b ON b.doc_id = c.idx_doc
            WHERE len(list_filter(generate_series(1, {num_hashes}),
                                  s -> a.sig[s] = b.sig[s])) >= {min_agree}
            GROUP BY c.doc_id
        )
        SELECT nd.doc_id,
               CASE WHEN e.exact_match IS NOT NULL THEN 'exact_dup'
                    WHEN nr.near_match IS NOT NULL THEN 'near_dup'
                    ELSE 'kept' END AS status,
               COALESCE(e.exact_match, nr.near_match, -1) AS match_doc_id
        FROM newdocs nd
        LEFT JOIN exact e USING (doc_id)
        LEFT JOIN near nr ON nr.doc_id = nd.doc_id
        ORDER BY nd.doc_id
    """
