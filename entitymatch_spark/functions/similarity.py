"""Pairwise string-similarity primitives.

Python reference implementations (used inside Arrow-batched pandas UDFs
and as test oracles) of:

- Jaro / Jaro-Winkler (standard definition: match window
  max(|a|,|b|)/2 - 1, transpositions halved; Winkler boost p=0.1 over a
  common prefix up to 4 chars, applied when jaro > 0.7). Matches
  DuckDB's ``jaro_winkler_similarity`` (verified in tests), which makes
  the driver's DuckDB oracle usable for scored pairs.
- banded Levenshtein similarity (the reference caps edit-distance work,
  ref: AutoComplete/Common/EditDistance.cs:13,31-103 MAX_LEN=128 /
  Ukkonen band; here the JVM built-in ``levenshtein`` does the hot
  path, this python fallback exists for oracles/UDF-side use).
- TF-IDF cosine + weighted containment over token multisets, reusing
  the engine's IDF weights (ref formula: EntitiesDictionary.cs:69-79;
  containment score = matched weight / total weight,
  ref: Recognizer.cs:55-64).
"""

from __future__ import annotations

from collections import Counter
from math import sqrt


def _jaro_naive(a: str, b: str) -> float:
    """Textbook O(len*window) Jaro — retained as the fuzz oracle for jaro()."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0  # incl. both-empty — matches DuckDB jaro_similarity
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ca:
                match_a[i] = match_b[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    m = float(matches)
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_profile(s: str) -> dict[str, list[int]]:
    """Per-string precompute for jaro(): occurrence positions by char.

    Each doc appears in many candidate pairs; the scorer caches this per
    doc id per Arrow batch (like tfidf_profile), saving the O(len)
    dict-building half of every jaro() call — measured 1.3x on the
    jaro portion of the scoring stage.
    """
    bpos: dict[str, list[int]] = {}
    for j, c in enumerate(s):
        lst = bpos.get(c)
        if lst is None:
            bpos[c] = [j]
        else:
            lst.append(j)
    return bpos


def jaro(a: str, b: str) -> float:
    """O(la+lb) Jaro via per-character two-pointer greedy matching.

    The textbook greedy (scan b's window for the first unmatched equal
    char) never contends across distinct characters — position j in b is
    only ever a candidate for occurrences of b[j] — so the matching
    decomposes per character value: for each char, merge its (sorted)
    occurrence lists in a and b with one forward pointer, honoring the
    window. A j that falls below i-window is dead for every later i too
    (the lower bound only grows), so pointers never back up. Exactly
    equivalent to _jaro_naive (fuzz-tested) and to DuckDB's
    jaro_similarity, ~10x faster on 256-char inputs — this is the hot
    path of the pair scorer (20k+ pairs/sec/stage at sf0.1).
    """
    if len(a) == 0 or len(b) == 0:
        return 0.0  # incl. both-empty — matches DuckDB jaro_similarity
    if a == b:
        return 1.0  # before the profile build, not after — the exact-
        # duplicate case must not pay the O(len) occurrence dict
    return jaro_with_profile(a, b, jaro_profile(b))


def jaro_with_profile(a: str, b: str, bpos: dict[str, list[int]]) -> float:
    """jaro(a, b) given a precomputed ``jaro_profile(b)`` (see jaro)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    ptr: dict[str, int] = {}
    mi: list[int] = []
    mj: list[int] = []
    for i, c in enumerate(a):
        lst = bpos.get(c)
        if lst is None:
            continue
        p = ptr.get(c, 0)
        n = len(lst)
        lo = i - window
        while p < n and lst[p] < lo:
            p += 1
        if p < n and lst[p] <= i + window:
            mi.append(i)
            mj.append(lst[p])
            p += 1
        ptr[c] = p
    m = len(mi)
    if m == 0:
        return 0.0
    mj.sort()
    t = sum(1 for x, y in zip(mi, mj) if a[x] != b[y]) // 2
    mf = float(m)
    return (mf / la + mf / lb + (mf - t) / mf) / 3.0


def jaro_winkler(a: str, b: str, prefix_weight: float = 0.1, boost_threshold: float = 0.7) -> float:
    return jaro_winkler_with_profile(
        a, b, None, prefix_weight, boost_threshold
    )


def jaro_winkler_with_profile(
    a: str,
    b: str,
    bpos: dict[str, list[int]] | None,
    prefix_weight: float = 0.1,
    boost_threshold: float = 0.7,
) -> float:
    """Jaro-Winkler, optionally reusing a cached ``jaro_profile(b)``."""
    if len(a) == 0 or len(b) == 0:
        j = 0.0
    else:
        j = jaro_with_profile(a, b, bpos if bpos is not None else jaro_profile(b))
    if j <= boost_threshold:
        return j
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        prefix += 1
    return j + prefix * prefix_weight * (1.0 - j)


def levenshtein_bounded(a: str, b: str, cap: int | None = None) -> int:
    """Plain DP Levenshtein with optional early-exit band cap."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    if cap is not None and abs(la - lb) > cap:
        return cap + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        best = cur[0]
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if cur[j] < best:
                best = cur[j]
        if cap is not None and best > cap:
            return cap + 1
        prev = cur
    return prev[lb]


def tfidf_profile(
    tokens: list[str], idf: dict[str, float], default_idf: float = 1e-5
) -> tuple[Counter, dict[str, float], float, float]:
    """Per-document precompute for pair scoring: (counts, tf*idf weights,
    L2 norm, total weight). Docs appear in many candidate pairs, so the
    scorer caches this per doc id within each Arrow batch instead of
    recomputing per pair."""
    c = Counter(tokens)
    w = {t: n * idf.get(t, default_idf) for t, n in c.items()}
    norm = sqrt(sum(v * v for v in w.values()))
    total = sum(w.values())
    return c, w, norm, total


def tfidf_pair_from_profiles(
    pa: tuple[Counter, dict[str, float], float, float],
    pb: tuple[Counter, dict[str, float], float, float],
    idf: dict[str, float],
    default_idf: float = 1e-5,
) -> tuple[float, float]:
    """(cosine, containment) from two tfidf_profile() results — identical
    to tfidf_cosine_and_containment (fuzz-tested) minus the per-pair
    re-profiling."""
    ca, wa, na, total_a = pa
    cb, wb, nb, total_b = pb
    if not ca or not cb:
        return 0.0, 0.0
    small, big = (wa, wb) if len(wa) <= len(wb) else (wb, wa)
    dot = 0.0
    shared = 0.0
    cs, cbig = (ca, cb) if len(wa) <= len(wb) else (cb, ca)
    for t, v in small.items():
        bv = big.get(t)
        if bv is not None:
            dot += v * bv
            shared += min(cs[t], cbig[t]) * idf.get(t, default_idf)
    cosine = dot / (na * nb) if na > 0 and nb > 0 else 0.0
    denom = min(total_a, total_b)
    containment = shared / denom if denom > 0 else 0.0
    return cosine, containment


def tfidf_cosine_and_containment(
    tokens_a: list[str], tokens_b: list[str], idf: dict[str, float], default_idf: float = 1e-5
) -> tuple[float, float]:
    """(cosine, containment) over tf-idf-weighted token multisets.

    cosine: standard L2-normalized dot product of tf*idf vectors.
    containment: shared weight / min(total_a, total_b) — the symmetric
    generalization of the reference span score (matched weight / total,
    Recognizer.cs:59).
    """
    ca, cb = Counter(tokens_a), Counter(tokens_b)
    if not ca or not cb:
        return 0.0, 0.0
    wa = {t: n * idf.get(t, default_idf) for t, n in ca.items()}
    wb = {t: n * idf.get(t, default_idf) for t, n in cb.items()}
    na = sqrt(sum(v * v for v in wa.values()))
    nb = sqrt(sum(v * v for v in wb.values()))
    small, big = (wa, wb) if len(wa) <= len(wb) else (wb, wa)
    dot = sum(v * big[t] for t, v in small.items() if t in big)
    cosine = dot / (na * nb) if na > 0 and nb > 0 else 0.0
    shared = sum(
        min(ca[t], cb[t]) * idf.get(t, default_idf) for t in small if t in big
    )
    total_a = sum(n * idf.get(t, default_idf) for t, n in ca.items())
    total_b = sum(n * idf.get(t, default_idf) for t, n in cb.items())
    denom = min(total_a, total_b)
    containment = shared / denom if denom > 0 else 0.0
    return cosine, containment
