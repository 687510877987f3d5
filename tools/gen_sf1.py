#!/usr/bin/env python
"""Generate tiled scale-up datasets (N x sf0.1) for scaling-slope
measurement — /root/testdata tops out at sf0.1, so super-linearity
claims above it would otherwise rest on plan shape alone.

    python tools/gen_sf1.py                    # sf1  (10 tiles)
    TILES=100 OUT=/root/repo/.data_cache/sf10 \
        python tools/gen_sf1.py                # sf10 (100 tiles)

Method: tile sf0.1 N times with per-tile key offsets, matching how
the driver itself scales (sf0.01 -> sf0.1 multiplies BOTH row counts
and key spaces by 10 while holding per-key densities constant:
600 lineitem rows per supplier at every SF). Dimension tables tile
with their keys; fact tables tile with every foreign key shifted by
the owning dimension's stride, so each tile is a self-consistent
shard — per-user history sizes, per-part rater counts, and events/sec
density scale exactly as the driver's generator does.

Documents get a TILE-DEPENDENT vocabulary permutation instead of a
verbatim copy: a verbatim N x copy would hand every doc N-1 exact
duplicates, which inflates near-dup candidate pairs ~N² instead of N
and poisons the dedup slope. The corpus has a CLOSED 31-word
vocabulary, so tile i remaps word index x by the AFFINE permutation
x -> (a_i*x + b_i) mod 31 with a_i = 1 + (i mod 30), b_i = 7*i mod
31 — tile 0 is the identity, the (a, b) pairs are distinct for
i < lcm(30, 31) = 930 tiles, and any two DISTINCT affine maps of a
prime field agree on at most ONE point, so cross-tile copies share at
most 1 of 31 vocabulary words (the earlier cyclic-shift family
repeats every 31 tiles, which at 100 tiles would plant ~3 exact
copies of every doc across tiles and the cross-tile pairs would
dominate the within-tile ones). Within a tile the same bijection
applies to every doc, so planted near-dup pairs keep their exact
similarity structure.

Embeddings get a per-tile coordinate transform with the same goals:
cyclic DIMENSION shift by 7*i mod 64 composed with a sign flip of
the odd coordinates when (i // 64) is odd — distinct for 128 tiles
(shifts alone repeat at 64). Both a uniform coordinate permutation
and a uniform sign pattern preserve every within-tile norm and dot
product EXACTLY (x'.y' = sum s_d^2 x_d y_d = x.y), so per-shard
neighbor structure is identical while cross-tile copies decorrelate.

Output: $OUT (default /root/repo/.data_cache/sf1/), gitignored.
Deterministic — no RNG anywhere, pure key arithmetic.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("OUT", "/root/repo/.data_cache/sf1")
TILES = int(os.environ.get("TILES", "10"))

# Per-table key strides (the sf0.1 key-space sizes).
S_SUPP, S_PART, S_CUST, S_ORD = 1_000, 20_000, 15_000, 150_000
S_EVT, S_USER, S_DOC, S_VEC = 100_000, 1_500, 5_000, 2_000

V = 31  # closed corpus vocabulary size (prime)
D = 64  # embedding dimension


def _vocab_map(i: int) -> tuple[int, int]:
    """Affine permutation coefficients for tile i (identity at i=0)."""
    return 1 + (i % 30), (7 * i) % V


def _dim_shift(i: int) -> tuple[int, int]:
    """(cyclic shift, odd-coordinate sign) for tile i."""
    return (7 * i) % D, -1 if (i // D) % 2 else 1


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


def _embedding_expr(i: int) -> str:
    shift, sign = _dim_shift(i)
    if shift == 0 and sign == 1:
        return "embedding"
    sgn = (
        "" if sign == 1
        else " * CASE WHEN r % 2 = 1 THEN -1.0 ELSE 1.0 END"
    )
    return (
        "CAST(list_transform(range(len(embedding)), "
        f"r -> embedding[1 + ((r + {shift}) % len(embedding))]{sgn}) "
        "AS FLOAT[])"
    )


def _doc_expr(i: int) -> str:
    a, b = _vocab_map(i)
    if (a, b) == (1, 0):
        return "text"
    return (
        "array_to_string("
        " list_transform(string_split(text, ' '),"
        "  x -> CASE WHEN list_position(vlist, x) IS NULL THEN x"
        f"       ELSE vlist[1 + ({a} * (list_position(vlist, x) - 1)"
        f"                       + {b}) % {V}] END),"
        " ' ')"
    )


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
        "embeddings": " UNION ALL ".join(
            f"SELECT (vec_id + {i} * {S_VEC}) AS vec_id, "
            f"({_embedding_expr(i)}) AS embedding, label "
            f"FROM '{SRC}/embeddings.parquet'"
            for i in range(TILES)
        ),
        "documents": " UNION ALL ".join(
            f"SELECT (doc_id + {i} * {S_DOC}) AS doc_id, "
            f"({_doc_expr(i)}) AS text, lang, source, n_chars "
            f"FROM base_docs"
            for i in range(TILES)
        ),
    }
    # documents needs the sorted corpus vocabulary available as `vlist`.
    con.sql(
        f"""
        CREATE VIEW base_docs AS
        SELECT d.*, v.vlist FROM '{SRC}/documents.parquet' d,
        (SELECT list_sort(list(DISTINCT w)) AS vlist FROM (
            SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
            FROM '{SRC}/documents.parquet')) v
        """
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
