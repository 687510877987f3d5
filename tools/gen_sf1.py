#!/usr/bin/env python
"""Generate a local sf1 dataset (10x sf0.1) for scaling-slope
measurement — /root/testdata tops out at sf0.1, so super-linearity
claims above it would otherwise rest on plan shape alone.

Method: tile sf0.1 ten times with per-tile key offsets, matching how
the driver itself scales (sf0.01 -> sf0.1 multiplies BOTH row counts
and key spaces by 10 while holding per-key densities constant:
600 lineitem rows per supplier at every SF). Dimension tables tile
with their keys; fact tables tile with every foreign key shifted by
the owning dimension's stride, so each tile is a self-consistent
shard — per-user history sizes, per-part rater counts, and events/sec
density scale exactly as the driver's generator does.

Documents get a TILE-DEPENDENT vocabulary permutation instead of a
verbatim copy: a verbatim 10x copy would hand every doc 9 exact/near
duplicates, which inflates near-dup candidate pairs ~100x instead of
10x and poisons the dedup slope. The corpus has a CLOSED 31-word
vocabulary, so tile i remaps every word by a cyclic shift of 7*i
positions (gcd(7,31)=1: a permutation with NO fixed points for i>0).
The same bijection applies to every doc within a tile, so planted
within-tile near-dup pairs keep their exact similarity structure,
while cross-tile copies share ZERO shingles and a fully remapped word
bag — both sequence-based (MinHash/winnowing) and bag-based (SimHash)
sketches see them as unrelated, which an earlier rotation+marker
transform did not achieve (bag overlap stayed ~80% and SimHash paired
cross-tile copies ~100x).

Output: $OUT (default /root/repo/.data_cache/sf1/), gitignored.
Deterministic — no RNG anywhere, pure key arithmetic.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("OUT", "/root/repo/.data_cache/sf1")
TILES = 10

# Per-table key strides (the sf0.1 key-space sizes).
S_SUPP, S_PART, S_CUST, S_ORD = 1_000, 20_000, 15_000, 150_000
S_EVT, S_USER, S_DOC, S_VEC = 100_000, 1_500, 5_000, 2_000


def tiled(con, table: str, exprs: dict[str, str], n_tiles: int = TILES) -> str:
    """UNION ALL of n_tiles SELECTs over the sf0.1 table, with the
    given columns replaced by tile-shifted expressions ({i} = tile)."""
    cols = [
        r[0]
        for r in con.sql(
            f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'"
        ).fetchall()
    ]
    selects = []
    for i in range(n_tiles):
        parts = [
            f"({exprs[c].format(i=i)}) AS {c}" if c in exprs else c
            for c in cols
        ]
        selects.append(
            f"SELECT {', '.join(parts)} FROM '{SRC}/{table}.parquet'"
        )
    return " UNION ALL ".join(selects)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    jobs = {
        # dims copied verbatim (fixed-size at every SF)
        "region": tiled(con, "region", {}, n_tiles=1),
        "nation": tiled(con, "nation", {}, n_tiles=1),
        "supplier": tiled(con, "supplier", {"s_suppkey": f"s_suppkey + {{i}} * {S_SUPP}"}),
        "part": tiled(con, "part", {"p_partkey": f"p_partkey + {{i}} * {S_PART}"}),
        "customer": tiled(con, "customer", {"c_custkey": f"c_custkey + {{i}} * {S_CUST}"}),
        "orders": tiled(
            con,
            "orders",
            {
                "o_orderkey": f"o_orderkey + {{i}} * {S_ORD}",
                "o_custkey": f"o_custkey + {{i}} * {S_CUST}",
            },
        ),
        "lineitem": tiled(
            con,
            "lineitem",
            {
                "l_orderkey": f"l_orderkey + {{i}} * {S_ORD}",
                "l_partkey": f"l_partkey + {{i}} * {S_PART}",
                "l_suppkey": f"l_suppkey + {{i}} * {S_SUPP}",
            },
        ),
        "events": tiled(
            con,
            "events",
            {
                "event_id": f"event_id + {{i}} * {S_EVT}",
                "user_id": f"user_id + {{i}} * {S_USER}",
            },
        ),
        # embeddings: per-tile cyclic DIMENSION shift (7*i of 64 dims).
        # A coordinate permutation applied uniformly within a tile
        # preserves every within-tile norm and dot product exactly
        # (neighbor structure identical per shard), while cross-tile
        # copies decorrelate — verbatim copies would put 10 identical
        # vectors in every LSH bucket and grow candidate pairs 100x.
        "embeddings": tiled(
            con,
            "embeddings",
            {
                "vec_id": f"vec_id + {{i}} * {S_VEC}",
                "embedding": (
                    "CASE WHEN {i} = 0 THEN embedding ELSE "
                    "CAST(list_transform(range(len(embedding)), "
                    "r -> embedding[1 + ((r + 7 * {i}) % len(embedding))]) "
                    "AS FLOAT[]) END"
                ),
            },
        ),
        # documents: per-tile cyclic vocabulary shift (see module doc).
        "documents": tiled(
            con,
            "documents",
            {
                "doc_id": f"doc_id + {{i}} * {S_DOC}",
                "text": (
                    "CASE WHEN {i} = 0 THEN text ELSE array_to_string("
                    " list_transform(string_split(text, ' '),"
                    "  x -> CASE WHEN list_position(vlist, x) IS NULL THEN x"
                    "       ELSE vlist[1 + (list_position(vlist, x) - 1"
                    "                       + 7 * {i}) % len(vlist)] END),"
                    " ' ') END"
                ),
            },
        ),
    }
    # documents needs the sorted corpus vocabulary available as `vlist`.
    jobs["documents"] = jobs["documents"].replace(
        f"FROM '{SRC}/documents.parquet'",
        f"FROM (SELECT d.*, v.vlist FROM '{SRC}/documents.parquet' d, "
        f"(SELECT list_sort(list(DISTINCT w)) AS vlist FROM ("
        f"SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w "
        f"FROM '{SRC}/documents.parquet')) v)",
    )

    for name, sql in jobs.items():
        dest = f"{OUT}/{name}.parquet"
        con.sql(f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dest}'").fetchone()[0]
        print(f"{name}: {n}", file=sys.stderr)
    # recompute n_chars for transformed docs
    con.sql(
        f"""
        COPY (SELECT doc_id, text, lang, source,
                     CAST(len(text) AS BIGINT) AS n_chars
              FROM '{OUT}/documents.parquet')
        TO '{OUT}/documents2.parquet' (FORMAT PARQUET)
        """
    )
    os.replace(f"{OUT}/documents2.parquet", f"{OUT}/documents.parquet")
    print("done ->", OUT, file=sys.stderr)


if __name__ == "__main__":
    main()
