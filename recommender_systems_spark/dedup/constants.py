"""Shared deterministic constants for dedup / LSH operators.

Generated with a self-contained LCG (not numpy) so the exact same
literal values can be embedded in both the Spark plans and the DuckDB
oracle SQL — cross-engine reproducibility by construction.
"""

from __future__ import annotations

MINHASH_PRIME = (1 << 31) - 1  # 2^31 - 1, matches the fingerprint modulus
LSH_BANDS = 4
LSH_ROWS = 4  # signature length = LSH_BANDS * LSH_ROWS = 16
SIMHASH_BITS = 31  # fingerprint hash is 31-bit


def lcg_stream(seed: int):
    """Numerical Recipes LCG — portable deterministic uint32 stream."""
    state = seed & 0xFFFFFFFF
    while True:
        state = (1664525 * state + 1013904223) & 0xFFFFFFFF
        yield state


def _minhash_coeffs(k: int) -> list[tuple[int, int]]:
    g = lcg_stream(42)
    out = []
    while len(out) < k:
        a = next(g) % (MINHASH_PRIME - 1) + 1  # a in [1, p-1]
        b = next(g) % MINHASH_PRIME  # b in [0, p-1]
        out.append((a, b))
    return out


MINHASH_COEFFS: list[tuple[int, int]] = _minhash_coeffs(LSH_BANDS * LSH_ROWS)


def hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Pseudo-random ±1 hyperplanes for cosine LSH (sign sketches).
    Rademacher entries are as effective as Gaussians for random
    projection and stay exactly representable in every engine.

    Bit choice matters: a power-of-two-modulus LCG's LOW bit alternates
    with period 2 (odd multiplier, odd increment), which would make every
    plane the same alternating ±1 vector and collapse the sketch to two
    buckets. Bit 16 has period 2^17 — effectively independent signs.

    ``seed`` selects an independent plane set — multi-table LSH unions
    several sets to trade candidate volume for recall."""
    g = lcg_stream(seed)
    return [
        [1.0 if (next(g) >> 16) & 1 else -1.0 for _ in range(dim)]
        for _ in range(n_planes)
    ]
