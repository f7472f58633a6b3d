"""Text-analysis building blocks as pure Spark SQL expressions
(SURVEY.md §2.12): tokenization, shingles, fingerprints, SimHash.

Everything here is a Column expression — no UDFs — so the text path
stays inside whole-stage codegen and scales with the JVM, not the
Python workers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small English stopword list for quality scoring / stopword-removal
# demos (full lists would come from a broadcast lexicon table).
EN_STOPWORDS = (
    "a an and are as at be by for from has he in is it its of on or that the "
    "to was were will with this these those"
).split()

# BPE-ish token pattern: word pieces or single non-space punctuation —
# a cheap stand-in for a real tokenizer's token-count behavior.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize_ws(text: Column | str) -> Column:
    """Whitespace tokens, lowercased, empties removed."""
    return F.filter(F.split(F.lower(_c(text)), r"\s+"), lambda t: t != "")


def bpe_ish_tokens(text: Column | str) -> Column:
    """Tokens under BPE_ISH_PATTERN (regexp_extract_all, JVM-side)."""
    return F.regexp_extract_all(F.lower(_c(text)), F.lit(BPE_ISH_PATTERN), 0)


def shingles(tokens: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles of a token array: element i joins tokens
    [i, i+n) with single spaces. Empty when fewer than n tokens.

    Implemented as n-1 zip_with passes against shifted copies rather
    than a transform-over-sequence with element_at: zip_with evaluates
    its array inputs exactly once, while a lambda that captures the
    token expression re-evaluates the whole upstream tree per element
    (measured 5x slower on the dedup corpus)."""
    t = _c(tokens)
    out = t
    for j in range(1, n):
        # tokens shifted left by j, padded so zip_with lengths line up
        # (slice length is computed, not a literal cap — a fixed bound
        # would silently corrupt shingles of pathologically long docs)
        shifted = F.concat(
            F.slice(t, j + 1, F.greatest(F.size(t) - j, F.lit(0))),
            F.array_repeat(F.lit(""), j),
        )
        out = F.zip_with(out, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(t) < n, F.array().cast("array<string>")).otherwise(
        F.slice(out, 1, F.greatest(F.size(t) - n + 1, F.lit(0)))
    )


def doc_fingerprint(text: Column | str, n: int = 3) -> Column:
    """Deterministic document fingerprint: the minimum md5 over word
    n-gram shingles (1-permutation MinHash). Near-identical docs agree
    with probability ≈ Jaccard similarity; cross-engine stable (md5).
    Falls back to md5 of the whole text for very short docs."""
    sh = shingles(tokenize_ws(text), n)
    return F.coalesce(
        F.array_min(F.transform(sh, F.md5)), F.md5(F.lower(_c(text)))
    )


def _hash_pm1(h: Column) -> Column:
    """64 ±1 contributions from the first 64 bits of an md5 hex string
    ``h`` that is already a BOUND value (an array element / lambda
    variable — reading it is free, unlike a captured md5 expression).
    Bit i comes from hex nibble floor(i/4) (1-indexed substring),
    LSB-first within the nibble — the exact extraction order and
    arithmetic of the original per-bit form, so simhash values are
    unchanged; each bit now costs a 1-char substring+conv instead of
    a full md5."""

    def bit(i: Column) -> Column:
        nib = F.conv(
            F.substring(h, (i / F.lit(4)).cast("int") + 1, 1), 16, 10
        ).cast("int")
        # (nib >> (i % 4)) & 1, written arithmetically (shiftleft needs
        # a literal shift amount)
        power = F.pow(F.lit(2.0), F.pmod(i, F.lit(4)).cast("double"))
        return F.floor(nib / power).cast("int") % 2

    return F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.when(bit(i) == 1, F.lit(1)).otherwise(F.lit(-1)),
    )


def simhash64(tokens: Column | str) -> Column:
    """64-bit SimHash of a token array, returned as an array<int> of
    64 bits (0/1). Bit i is 1 when the summed ±1 md5-bit contributions
    of all tokens are positive. Kept as a bit array (not bigint) so
    hamming distance stays a cheap zip_with and bit 63 needs no
    sign gymnastics.

    The token hashes are materialized as an array FIRST
    (``transform(tokens, md5)`` stores each md5 result as an element)
    before the fold reads them: an md5 captured inside the per-bit
    lambda re-evaluates per element (the CLAUDE.md lambda rule) —
    the original form computed 64 md5s per token and was ~90% of
    simhash_pairs' wall time (SCALING.md round 8)."""
    t = _c(tokens)
    hashes = F.transform(t, F.md5)
    sums = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(acc, _hash_pm1(h), lambda a, b: a + b),
    )
    return F.transform(sums, lambda s: F.when(s > 0, F.lit(1)).otherwise(F.lit(0)))


def hamming(bits_a: Column | str, bits_b: Column | str) -> Column:
    """Hamming distance between two equal-length bit arrays."""
    return F.aggregate(
        F.zip_with(_c(bits_a), _c(bits_b), lambda x, y: (x != y).cast("int")),
        F.lit(0),
        lambda s, x: s + x,
    )


def _rotl64(c: Column, k: int) -> Column:
    """Bitwise rotate-left on a BIGINT column (overflow-free under
    ANSI mode, unlike multiplicative mixing)."""
    return F.shiftleft(c, k).bitwiseOR(F.shiftrightunsigned(c, 64 - k))


def token_hashes(tokens: Column | str) -> Column:
    """xxhash64 of each token — materialize THIS as a column before
    calling hashed_shingles on it (the expression appears n times in
    the fold; a column reference is free, a re-evaluated
    tokenize+hash tree is not)."""
    return F.transform(_c(tokens), lambda x: F.xxhash64(x))


def hashed_shingles(th: Column | str, n: int = 3) -> Column:
    """64-bit hashes of word n-gram shingles WITHOUT materializing the
    shingle strings: ``th`` is a MATERIALIZED array<bigint> column of
    per-token hashes (see token_hashes); n-1 zip_with passes fold
    consecutive token hashes with rotate-xor mixing — pure bigint math
    in codegen instead of per-shingle string concat + string hashing
    (measured 3x faster on the 4-gram dedup corpus, identical
    downstream pair sets).

    Position-sensitive by construction (each pass rotates the
    accumulator before xor, so "a b" and "b a" differ). Use where only
    shingle IDENTITY matters (set intersection, minhash input, join
    keys) — collisions ~n²/2^64, the exact_dedup stance; use
    ``shingles`` when the shingle TEXT must survive (fingerprints, or
    any oracle that mirrors the strings)."""
    h = _c(th)
    acc = h
    for j in range(1, n):
        shifted = F.slice(h, j + 1, 2_000_000_000)
        k = (17 * j) % 63 + 1
        acc = F.zip_with(acc, shifted, lambda a, b: _rotl64(a, k).bitwiseXOR(b))
    # entries past size-n+1 folded with zip_with's null padding → NULL;
    # trim to the valid prefix (empty when fewer than n tokens, the
    # same contract as shingles())
    return F.slice(acc, 1, F.greatest(F.size(h) - (n - 1), F.lit(0)))
