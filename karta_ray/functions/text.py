"""Text kernels: shingling, MinHash, SimHash, language ID, quality
metrics, fingerprints.

Everything is deterministic and hash-based (no RNG state), so any shard
of a corpus computes identical values on any worker.
"""

from __future__ import annotations

import hashlib

import numpy as np

_M61 = np.uint64((1 << 61) - 1)
_B = np.uint64(1_000_003)


def hash_bytes_u64(parts: list[bytes]) -> np.ndarray:
    """Deterministic 64-bit hash per byte string (blake2b truncation)."""
    out = np.empty(len(parts), dtype=np.uint64)
    for i, p in enumerate(parts):
        out[i] = int.from_bytes(
            hashlib.blake2b(p, digest_size=8).digest(), "little")
    return out


def char_shingles(text: str, n: int = 3) -> np.ndarray:
    """Distinct hashed character n-grams of one document (uint64).

    Uses a polynomial rolling hash mod 2^61-1 over UTF-8 code points —
    one pass, vectorized via cumulative powers.
    """
    if len(text) < n:
        return np.unique(hash_bytes_u64([text.encode()])) if text else \
            np.empty(0, dtype=np.uint64)
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    with np.errstate(over="ignore"):
        # windows of length n: h = sum(c[i+j] * B^(n-1-j)) mod M61
        h = np.zeros(len(codes) - n + 1, dtype=np.uint64)
        for j in range(n):
            h = (h * _B + codes[j:len(codes) - n + 1 + j]) % _M61
    return np.unique(h)


# MinHash permutation parameters (fixed, deterministic)
_MERSENNE = np.uint64((1 << 61) - 1)


def _minhash_params(k: int):
    rng = np.random.RandomState(12345)
    a = rng.randint(1, (1 << 61) - 1, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=k, dtype=np.int64).astype(np.uint64)
    return a, b


_MH_A, _MH_B = _minhash_params(128)


def minhash_signature(shingles: np.ndarray, k: int = 128) -> np.ndarray:
    """k-permutation MinHash signature of a shingle set
    (uint64[k]; empty set -> all max)."""
    if len(shingles) == 0:
        return np.full(k, np.iinfo(np.uint64).max, dtype=np.uint64)
    a = _MH_A[:k][:, None]
    b = _MH_B[:k][:, None]
    with np.errstate(over="ignore"):
        vals = (a * shingles[None, :] + b) % _MERSENNE
    return vals.min(axis=1)


def band_keys(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """LSH band bucket keys: hash of each band's rows (uint64[bands])."""
    assert bands * rows <= len(sig)
    out = np.empty(bands, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for bidx in range(bands):
            chunk = sig[bidx * rows:(bidx + 1) * rows]
            h = np.uint64(1469598103934665603)
            for v in chunk:
                h = (h ^ v) * np.uint64(1099511628211)
            out[bidx] = h
    return out


def simhash64(token_hashes: np.ndarray) -> np.uint64:
    """64-bit SimHash of a multiset of token hashes."""
    if len(token_hashes) == 0:
        return np.uint64(0)
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    score = (2 * bits - 1).sum(axis=0)
    with np.errstate(over="ignore"):
        return np.uint64(((score > 0).astype(np.uint64)
                          << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


# ---------------------------------------------------------------------------
# Language ID (n-gram/stopword heuristic)
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": (" the ", " and ", " of ", " to ", " is ", " that "),
    "de": (" der ", " und ", " die ", " das ", " ist ", " nicht "),
    "fr": (" le ", " la ", " les ", " et ", " est ", " que "),
    "es": (" el ", " la ", " los ", " que ", " es ", " y "),
    "zh": ("的", "是", "了", "在", "我", "不"),
}
_LANGS = sorted(_LANG_MARKERS)


def lang_id(text: str) -> str:
    """Marker-frequency language guess; deterministic ties -> first in
    sorted lang order."""
    padded = f" {text.lower()} "
    best = ("und", 0)
    for lang in _LANGS:
        score = sum(padded.count(m) for m in _LANG_MARKERS[lang])
        if score > best[1]:
            best = (lang, score)
    return best[0]


# ---------------------------------------------------------------------------
# Quality metrics (integer-exact, SQL-mirrorable)
# ---------------------------------------------------------------------------

def quality_counts(text: str) -> tuple[int, int, int, int, int]:
    """(n_chars, n_spaces, n_periods, n_commas, n_digits) — all integer
    and definable identically in SQL via length/replace."""
    return (len(text),
            text.count(" "),
            text.count("."),
            text.count(","),
            sum(text.count(d) for d in "0123456789"))


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode()).hexdigest()
