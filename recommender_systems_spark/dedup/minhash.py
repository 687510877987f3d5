"""MinHash-LSH and SimHash kernels (training-data near-dedup extensions).

Spark side: pure built-in higher-order functions over shingle arrays —
signatures and band keys are computed in whole-stage codegen, then
near-dup candidates come from an equi-join on (band, key). No cross
join anywhere: at 100 TB the only shuffle is the band-bucket join,
whose key space is ~|docs|·BANDS rows of (int, small string).

Oracle side: every expression has a DuckDB SQL generator driven by the
SAME constants (``dedup.constants``), so the two engines cannot drift —
the pattern established by ``queries.textops``.

Pipeline (the standard LSH funnel):

    tokens → word shingles → rolling-hash per shingle (portable 31-bit)
    → MinHash signature (16 = LSH_BANDS×LSH_ROWS permutations)
    → band keys (4 bands × 4 rows) → bucket equi-join → candidate pairs
    → verify: signature agreement + exact shingle Jaccard.

SimHash variant: char-5-gram hashes → 31-bit majority sketch → 16-bit
band pigeonhole join (Hamming ≤ 1 ⟹ ≥1 of 2 bands equal) → bit_count
verify.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from recommender_systems_spark.dedup.constants import (
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_COEFFS,
    MINHASH_PRIME,
    SIMHASH_BITS,
)
from recommender_systems_spark.functions.text import (
    FINGERPRINT_MOD,
    char_ngrams,
    word_shingles,
)

SHINGLE_N = 3  # word-shingle width for MinHash
SIMHASH_NGRAM = 5  # char-n-gram width for SimHash
# Pigeonhole band width: the emitted threshold is Hamming ≤ 1, so TWO
# bands covering 31 bits suffice (a single differing bit lives in one
# band; the other band matches exactly). Wider bands ⇒ exponentially
# smaller buckets: at sf0.1 the old 4×8-bit geometry produced ~9.8M
# candidate pairs (max bucket 3,345), 2×16 bits produces ~1.0M (max
# 800) for the identical final pair set.
SIMHASH_BAND_BITS = 16
SIMHASH_BANDS = 2


# ---------------------------------------------------------------------------
# Spark column builders
# ---------------------------------------------------------------------------


def _fp(col: Column) -> Column:
    """Portable base-31 rolling hash of a string expression (same math
    as functions.text.rolling_fingerprint, usable inside lambdas)."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * F.lit(31) + F.ascii(ch), F.lit(FINGERPRINT_MOD)),
    )


def shingle_hashes(col: Column | str, n: int = SHINGLE_N) -> Column:
    """array<long>: rolling hash of every word n-shingle."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(word_shingles(c, n), _fp)


def minhash_signature(hashes: Column) -> Column:
    """array<long> of LSH_BANDS×LSH_ROWS minima under the affine hash
    family h_i(x) = (aᵢ·x + bᵢ) mod p (universal family over the
    Mersenne prime p = 2³¹−1; aᵢ·x < 2⁶² stays in long range).

    Single-traversal: ONE ``aggregate`` carries all 16 running minima —
    a naive ``array(array_min(transform(hashes, …)) × 16)`` embeds the
    ``hashes`` expression 16 times and Catalyst re-evaluates it per
    slot (HOFs are interpreted, no CSE), a measured ~16× slowdown."""

    def step(acc: Column, h: Column) -> Column:
        return F.array(
            *[
                F.least(
                    F.element_at(acc, i + 1),
                    F.pmod(F.lit(a) * h + F.lit(b), F.lit(MINHASH_PRIME)),
                )
                for i, (a, b) in enumerate(MINHASH_COEFFS)
            ]
        )

    init = F.array(*[F.lit(MINHASH_PRIME).cast("long") for _ in MINHASH_COEFFS])
    return F.aggregate(hashes, init, step)


def band_key(sig: Column, band: int) -> Column:
    """String bucket key for one LSH band: ROWS signature slots joined."""
    lo = band * LSH_ROWS + 1  # slice() is 1-based
    return F.array_join(
        F.transform(F.slice(sig, lo, LSH_ROWS), lambda x: x.cast("string")), ":"
    )


def signature_agreement(sig_a: Column, sig_b: Column) -> Column:
    """#equal slots — E[agreement/len] estimates the Jaccard similarity."""
    return F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def jaccard(shingles_a: Column, shingles_b: Column) -> Column:
    """Exact Jaccard over distinct shingle sets (the verify step)."""
    da = F.array_distinct(shingles_a)
    db = F.array_distinct(shingles_b)
    inter = F.size(F.array_intersect(da, db)).cast("double")
    return inter / (F.size(da) + F.size(db) - inter)


def simhash(col: Column | str, n: int = SIMHASH_NGRAM) -> Column:
    """31-bit SimHash: majority vote per bit over char-n-gram hashes.

    Single-traversal: one ``aggregate`` walks the hash array ONCE with
    a 32-slot accumulator (31 per-bit counts + the total); the finish
    lambda assembles the majority bits from the bound accumulator. The
    naive form (31 × size(filter(hs, …))) re-evaluates the n-gram
    hashing per bit — measured ~60× slower."""
    c = F.col(col) if isinstance(col, str) else col
    hs = F.transform(char_ngrams(c, n), _fp)

    # 31 per-bit counters packed 4-per-long in 16-bit fields (counts are
    # bounded by #ngrams < 2^16) + one total-count slot: a 9-slot
    # accumulator instead of 32. The per-element array rebuild dominates
    # interpreted-aggregate cost, so narrower acc ⇒ proportionally
    # faster (measured ~2× at 1k ngrams/doc).
    n_longs = (SIMHASH_BITS + 3) // 4

    def packed(h: Column, i: int) -> Column:
        out = None
        for slot in range(4):
            j = i * 4 + slot
            if j >= SIMHASH_BITS:
                break
            term = F.shiftleft(
                F.shiftright(h, j).bitwiseAND(F.lit(1)), 16 * slot
            )
            out = term if out is None else out + term
        return out

    def step(acc: Column, h: Column) -> Column:
        return F.array(
            *[F.element_at(acc, i + 1) + packed(h, i) for i in range(n_longs)],
            F.element_at(acc, n_longs + 1) + F.lit(1),
        )

    def finish(acc: Column) -> Column:
        total = F.element_at(acc, n_longs + 1)
        out = F.lit(0)
        for j in range(SIMHASH_BITS):
            cnt = F.shiftright(
                F.element_at(acc, j // 4 + 1), 16 * (j % 4)
            ).bitwiseAND(F.lit(0xFFFF))
            out = out + F.when(cnt * 2 >= total, F.lit(1 << j)).otherwise(F.lit(0))
        return out.cast("long")

    init = F.array(*[F.lit(0).cast("long") for _ in range(n_longs + 1)])
    return F.aggregate(hs, init, step, finish)


def simhash_pandas(col: Column) -> Column:
    """Arrow-vectorised SimHash — numerically IDENTICAL to ``simhash``
    (same char-5-gram rolling polynomial, same majority vote) but
    computed with NumPy sliding windows inside a pandas UDF.

    Why a UDF here when the engine rule is built-ins-first: the
    built-in form needs a hash per overlapping n-gram, which in
    expression land means re-splitting the string per gram inside an
    interpreted HOF (captured expressions are re-evaluated per lambda
    call — there is no CSE). The Arrow batch + O(L) NumPy window is the
    idiomatic Spark escape hatch for exactly this shape, and it is
    ~30× faster per document. Parity note: the n-gram polynomial
    Σ cᵢ·31^t < 2³¹−1 for ASCII inputs, so the single-mod NumPy value
    equals the oracle's step-wise-mod fold exactly."""
    from pyspark.sql.functions import pandas_udf

    n = SIMHASH_NGRAM
    bits = SIMHASH_BITS

    @pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        import numpy as np

        pows = (31 ** np.arange(n - 1, -1, -1, dtype=np.int64))
        masks = (np.int64(1) << np.arange(bits, dtype=np.int64))

        def one(t: str) -> int:
            codes = np.frombuffer(t.lower().encode("utf-8"), dtype=np.uint8).astype(
                np.int64
            )
            if len(codes) <= n - 1:
                h = np.array(
                    [int((codes * (31 ** np.arange(len(codes) - 1, -1, -1, dtype=np.int64))).sum() % MINHASH_PRIME)],
                    dtype=np.int64,
                )
            else:
                win = np.lib.stride_tricks.sliding_window_view(codes, n)
                h = (win @ pows) % MINHASH_PRIME
            cnt = ((h[:, None] & masks) != 0).sum(axis=0)
            majority = cnt * 2 >= len(h)
            return int((masks * majority).sum())

        return texts.map(one)

    return _simhash(col)


def simhash_band(sim: Column, band: int) -> Column:
    """16-bit pigeonhole band (band 1 carries the top 15 bits)."""
    return F.shiftright(sim, band * SIMHASH_BAND_BITS).bitwiseAND(
        F.lit((1 << SIMHASH_BAND_BITS) - 1)
    )


# Adaptive complement-block keys (Manku et al., WWW'07): with Hamming
# ≤ 1, the differing bit lives in ONE of B blocks, so a table keyed on
# ALL BITS EXCEPT block t catches the pair when the error is in block
# t — B tables guarantee exact recall at ANY B, and the candidate set
# only shrinks as B grows (keys widen from 31−⌈31/B⌉ bits). A FIXED
# geometry is the LSH capacity failure: 2 tables × ~16-bit keys make
# random collisions grow as n²/2^16 (measured: dedup_source_overlap
# hit 176× wall at 100× data). The ladder below widens keys as the
# corpus grows; at B=2 the complement of one block IS the other
# block, so the CANDIDATE-PAIR SET — and therefore the verified
# `near` output — is identical to the historical 2×16-bit band form
# at every n ≤ 100k documents. (The key VALUES are not bit-for-bit
# equal: complement keys mask bits in place while the old band keys
# were shifted 16-bit extracts with swapped band indices — equivalence
# holds at the pair-set level, not for persisted key columns.) The
# verified `near` set is identical at every B — only candidate volume
# changes.
SIMHASH_MAX_TABLES = 8


def simhash_n_tables(n_docs: int) -> int:
    """Block count for a corpus of ``n_docs`` documents (2 → 4 → 8)."""
    if n_docs <= 100_000:
        return 2
    if n_docs <= 2_000_000:
        return 4
    return SIMHASH_MAX_TABLES


def _simhash_block_mask(n_tables: int, t: int) -> int:
    """Bit mask of block ``t`` when the 31 bits split into ``n_tables``
    contiguous blocks of ⌈31/B⌉ bits (the last block is narrower)."""
    w = -(-SIMHASH_BITS // n_tables)
    lo = t * w
    hi = min(lo + w, SIMHASH_BITS)
    return ((1 << hi) - 1) ^ ((1 << lo) - 1)


def simhash_table_keep_mask(n_tables: int, t: int) -> int:
    """Mask of the bits a table-``t`` key KEEPS (everything except
    block ``t``) — key equality ⇔ all non-block-t bits equal."""
    return ((1 << SIMHASH_BITS) - 1) ^ _simhash_block_mask(n_tables, t)


def simhash_table_key(sim: Column, n_tables: int, t: int) -> Column:
    """Table-``t`` candidate key: the simhash with block ``t`` masked
    out. Join on (table, key) — the pair agrees everywhere outside
    block t, so a 1-bit difference is caught by exactly one table."""
    return sim.bitwiseAND(F.lit(simhash_table_keep_mask(n_tables, t)))


# ---------------------------------------------------------------------------
# DuckDB SQL generators (same constants, same arithmetic)
# ---------------------------------------------------------------------------


def sql_tokens(text_expr: str) -> str:
    return f"regexp_extract_all(lower({text_expr}), '[a-z0-9]+')"


def sql_shingles(toks_expr: str, n: int = SHINGLE_N) -> str:
    """Word n-shingles, matching functions.text.word_shingles edge cases."""
    return f"""
        CASE WHEN len({toks_expr}) <= {n - 1}
             THEN [array_to_string({toks_expr}, ' ')]
             ELSE list_transform(range(1, len({toks_expr}) - {n - 2}),
                                 i -> array_to_string(({toks_expr})[i:i+{n - 1}], ' '))
        END
    """


def sql_char_ngrams(text_expr: str, n: int = SIMHASH_NGRAM) -> str:
    """Char n-grams of the lowercased text (functions.text.char_ngrams)."""
    return f"""
        CASE WHEN length(lower({text_expr})) <= {n - 1}
             THEN [lower({text_expr})]
             ELSE list_transform(range(1, length(lower({text_expr})) - {n - 2}),
                                 i -> lower({text_expr})[i:i+{n - 1}])
        END
    """


def sql_fp(str_lambda_var: str = "s", base: int = 31) -> str:
    """Rolling hash of a string lambda variable (default base 31)."""
    return f"""list_reduce(
        list_prepend(CAST(0 AS BIGINT),
            list_transform(regexp_split_to_array({str_lambda_var}, ''),
                           ch -> CAST(ascii(ch) AS BIGINT))),
        (acc, x) -> (acc * {base} + x) % {FINGERPRINT_MOD})"""


def sql_shingle_hashes(shingles_expr: str) -> str:
    return f"list_transform({shingles_expr}, s -> {sql_fp('s')})"


def sql_minhash_signature(hashes_expr: str) -> str:
    mins = ", ".join(
        f"list_min(list_transform({hashes_expr}, "
        f"h -> (CAST({a} AS BIGINT) * h + {b}) % {MINHASH_PRIME}))"
        for a, b in MINHASH_COEFFS
    )
    return f"[{mins}]"


def sql_band_key(sig_expr: str, band: int) -> str:
    lo = band * LSH_ROWS + 1
    hi = lo + LSH_ROWS - 1
    return (
        f"array_to_string(list_transform(({sig_expr})[{lo}:{hi}], "
        f"x -> CAST(x AS VARCHAR)), ':')"
    )


def sql_simhash_bands(n_docs_expr: str = "(SELECT count(*) FROM documents)") -> str:
    """DuckDB twin of the adaptive complement-block key emission: one
    UNION ALL branch per (B, table) over ``sh(doc_id, sim)``, each
    gated by the same integer corpus-size ladder as
    ``simhash_n_tables`` so exactly one B's branches are non-empty."""
    gates = {
        2: f"{n_docs_expr} <= 100000",
        4: f"{n_docs_expr} > 100000 AND {n_docs_expr} <= 2000000",
        SIMHASH_MAX_TABLES: f"{n_docs_expr} > 2000000",
    }
    branches = [
        f"(SELECT doc_id, sim, {t} AS band, "
        f"sim & {simhash_table_keep_mask(n_tables, t)} AS key "
        f"FROM sh WHERE {gate})"
        for n_tables, gate in gates.items()
        for t in range(n_tables)
    ]
    return " UNION ALL ".join(branches)


def sql_simhash(hashes_expr: str) -> str:
    terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter({hashes_expr}, h -> (h & {1 << j}) != 0))"
        f" >= len({hashes_expr}) THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"CAST({terms} AS BIGINT)"


__all__ = [
    "LSH_BANDS",
    "LSH_ROWS",
    "SHINGLE_N",
    "SIMHASH_BAND_BITS",
    "SIMHASH_BANDS",
    "SIMHASH_NGRAM",
    "band_key",
    "jaccard",
    "minhash_signature",
    "shingle_hashes",
    "signature_agreement",
    "simhash",
    "simhash_band",
    "simhash_n_tables",
    "simhash_table_keep_mask",
    "simhash_table_key",
    "sql_band_key",
    "sql_simhash_bands",
    "sql_char_ngrams",
    "sql_fp",
    "sql_minhash_signature",
    "sql_shingle_hashes",
    "sql_shingles",
    "sql_simhash",
    "sql_tokens",
]


# ---------------------------------------------------------------------------
# Arrow-vectorised kernels (numerically identical to the HOF builders)
# ---------------------------------------------------------------------------


def _np_shingle_hashes(text: str, n: int):
    """Distinct word n-shingles of ``text`` and their base-31 rolling
    hashes — the NumPy twin of
    ``array_distinct(shingle_hashes(col, n))``. Distinctness is safe
    for every consumer here: MinHash minima and set-membership probes
    are invariant under multiplicity. Parity caveat (same as
    ``simhash_pandas``): byte codes equal Spark's ``ascii()`` code
    points for ASCII text.

    Returns (distinct_shingles list[str], hashes np.ndarray[int64]),
    first-occurrence order (matching ``array_distinct``)."""
    import re

    import numpy as np

    toks = re.findall(r"[a-z0-9]+", text.lower())
    if len(toks) <= n - 1:
        sh = [" ".join(toks)]
    else:
        sh = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    dsh = list(dict.fromkeys(sh))
    return dsh, _np_hash_strings(dsh)


def _np_hash_strings(strs: list) -> "np.ndarray":
    """Vectorised base-31 rolling hashes of a list of ASCII strings.

    Step-wise Horner with mod per character — the exact fold both the
    HOF and the oracle run (vectorised across strings, looped over the
    ≤ max-length character positions)."""
    import numpy as np

    lens = np.array([len(s) for s in strs], dtype=np.int64)
    lmax = int(lens.max()) if len(strs) else 0
    mat = np.zeros((len(strs), lmax), dtype=np.int64)
    for i, s in enumerate(strs):
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
        mat[i, : len(b)] = b
    acc = np.zeros(len(strs), dtype=np.int64)
    for j in range(lmax):
        live = j < lens
        acc = np.where(live, (acc * 31 + mat[:, j]) % FINGERPRINT_MOD, acc)
    return acc


def winnow_fingerprints_pandas(col: Column, n: int, w: int) -> Column:
    """Arrow-vectorised winnowing fingerprints (Schleimer, Wilkerson &
    Aiken 2003, the MOSS local document fingerprinting): positional
    word-n-shingle rolling hashes (WITH multiplicity — winnowing is a
    positional scheme, unlike the MinHash set kernels), then the min of
    every length-``w`` window of consecutive hashes, distinct values.
    Guarantees every run of w consecutive shingles contributes a
    fingerprint while keeping the stored set ~2/(w+1) of the hashes —
    the density/recall trade every plagiarism & contamination detector
    built on MOSS relies on. Oracle twin: the same window-min over
    ``sql_shingle_hashes`` WITHOUT list_distinct (positional), see
    queries.neardup."""
    import numpy as np
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    def one(t: str) -> list:
        import re

        toks = re.findall(r"[a-z0-9]+", t.lower())
        if len(toks) <= n - 1:
            sh = [" ".join(toks)]
        else:
            sh = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        hs = _np_hash_strings(sh)
        m = len(hs)
        if m == 0:
            return []
        wlen = min(w, m)
        k = m - wlen + 1  # number of windows
        stack = np.stack([hs[j : j + k] for j in range(wlen)])
        return np.unique(stack.min(axis=0)).tolist()

    @pandas_udf("array<long>")
    def _wf(texts):
        return texts.map(one)

    return _wf(col)


def minhash_struct_pandas(
    col: Column, n: int = SHINGLE_N, char_gram_n: int | None = None
) -> Column:
    """Arrow-vectorised (distinct shingles, MinHash signature) struct —
    value-identical to ``array_distinct(word_shingles(col, n))`` +
    ``minhash_signature(shingle_hashes(col, n))`` but computed with
    NumPy inside one pandas UDF.

    Why (same rationale as ``simhash_pandas``): the HOF signature folds
    a 16-minimum accumulator per shingle in the interpreted expression
    evaluator; the Arrow path does one (shingles × 16) int64 matrix mod
    and a column-min — measured ~4× faster per document batch, and the
    shingle set comes for free for the exact-Jaccard verify.

    ``char_gram_n``: when set, ``da`` carries the distinct char n-grams
    (``array_distinct(char_ngrams(col, char_gram_n))``) instead of word
    shingles — the verify set used by ``dedup_ngram_jaccard``; the
    signature is still the word-shingle MinHash either way."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    a_vec = [a for a, _ in MINHASH_COEFFS]
    b_vec = [b for _, b in MINHASH_COEFFS]
    schema = StructType(
        [
            StructField("da", ArrayType(StringType())),
            StructField("sig", ArrayType(LongType())),
        ]
    )

    @pandas_udf(schema)
    def _mh(texts: pd.Series) -> pd.DataFrame:
        a_arr = np.array(a_vec, dtype=np.int64)
        b_arr = np.array(b_vec, dtype=np.int64)
        das, sigs = [], []
        for t in texts:
            dsh, hs = _np_shingle_hashes(t, n)
            if len(hs):
                grid = (hs[:, None] * a_arr[None, :] + b_arr[None, :]) % MINHASH_PRIME
                sig = grid.min(axis=0)
            else:
                sig = np.full(len(a_vec), MINHASH_PRIME, dtype=np.int64)
            if char_gram_n is not None:
                low = t.lower()
                if len(low) <= char_gram_n - 1:
                    grams = [low]
                else:
                    grams = [
                        low[i : i + char_gram_n]
                        for i in range(len(low) - char_gram_n + 1)
                    ]
                das.append(list(dict.fromkeys(grams)))
            else:
                das.append(dsh)
            sigs.append(sig.tolist())
        return pd.DataFrame({"da": das, "sig": sigs})

    return _mh(col)


def shingle_hashes_pandas(col: Column, n: int) -> Column:
    """Arrow-vectorised distinct word-n-shingle hashes (array<long>) —
    value-identical to ``array_distinct(shingle_hashes(col, n))``; the
    probe-side kernel for the contamination check."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _sh(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _np_shingle_hashes(t, n)[1].tolist())

    return _sh(col)
