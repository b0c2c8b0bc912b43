"""Cross-engine deterministic string hashing.

The round-1 dedup/fingerprint operators assigned shingle/token ids with a
vocabulary rank (`row_number().over(Window.orderBy(...))` + broadcast
join) so that DuckDB could reproduce the ids — an oracle convenience that
is a single-partition global sort plus a driver-sized vocabulary
broadcast: exactly what dies first at 100 TB.

This module replaces it with a Horner polynomial over character codes,

    h(s) = fold(chars(s), 0, (acc, c) -> (acc * 31 + code(c)) % P)

which is pure map-side arithmetic (no shuffle, no vocabulary, no global
sort) AND is expressible identically in DuckDB SQL, so every query built
on it stays oracle-checked. Collisions (birthday ~n²/2P for n distinct
strings over P = 1e6+3) merge a pair of shingle ids occasionally; both
engines merge identically, and for MinHash/SimHash/Jaccard-on-ids the
effect is sub-rounding noise, so determinism — the property the
correctness gate needs — is preserved.

The xxhash64 variants remain available for production corpora where a
64-bit hash range is wanted (`use_xxhash=True` call sites); they are not
oracle-checkable because DuckDB has no xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PRIME = 1_000_003


def char_poly_hash(col: Column | str, prime: int = PRIME) -> Column:
    """Horner fold over the string's characters, JVM-side (split into a
    char array + higher-order aggregate, inside WholeStageCodegen)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % prime,
    )


def char_poly_hash_sql(expr: str, prime: int = PRIME) -> str:
    """The identical fold in DuckDB SQL (list_reduce seeds with the first
    element, which equals Horner-from-0 after one step). CAST to BIGINT:
    downstream products like sid * minhash_coeff overflow INT32."""
    return (
        f"CAST(list_reduce(list_transform(regexp_split_to_array({expr}, ''), "
        f"c -> unicode(c)), (acc, c) -> (acc*31 + c) % {prime}) AS BIGINT)"
    )


def sha_prefix_hash(col: Column | str, prime: int = PRIME) -> Column:
    """sha2-prefix hash: the first 48 bits of SHA-256, mod `prime`.
    Unlike the per-character Horner fold (interpreted, ~length
    expression-eval steps per string), every piece here — sha2,
    substring, conv — is a single native Catalyst expression inside
    WholeStageCodegen, so it is the right id hash for LONG strings
    (shingles). DuckDB reproduces it exactly via sha256 + hex cast."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.sha2(c, 256), 1, 12), 16, 10).cast("long") % prime
    )


def sha_prefix_hash_sql(expr: str, prime: int = PRIME) -> str:
    """The identical sha2-prefix hash in DuckDB SQL."""
    return f"(CAST(('0x' || substr(sha256({expr}), 1, 12)) AS BIGINT) % {prime})"
