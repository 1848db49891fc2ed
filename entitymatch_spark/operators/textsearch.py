"""Multi-pattern text search (Aho-Corasick) as a batched Arrow operator.

The reference builds a keyword trie with failure links and streams all
keyword occurrences through a text (ref:
EntityMatch/EntityMatch/StringSearch.cs:278-336 build, 362-442 search;
FindAll / FindFirst / ContainsAny). Spark-side, the dictionary is
broadcast and the automaton is built ONCE per executor (lazy cache
keyed by the broadcast id), then each Arrow batch streams through it —
one Python hop per batch, output exploded to (doc, phrase, start) rows.

For equi-token matching the posting join (J2) supersedes this; the AC
operator is for matching dictionary *phrases* against raw (unnormalized
or normalized) text, e.g. brand/entity lexicons over web pages.
"""

from __future__ import annotations

import hashlib
from collections import deque

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ACAutomaton:
    """Plain-python Aho-Corasick: goto/fail/output (StringSearch.cs analog)."""

    def __init__(self, phrases: list[str]):
        if any(not p for p in phrases):
            # an empty phrase would "match" at every position with an
            # out-of-range start (i + 1) — reject at build time
            raise ValueError("empty phrases are not searchable")
        self.goto: list[dict[str, int]] = [{}]
        self.fail: list[int] = [0]
        self.out: list[list[int]] = [[]]
        # dedup, order-preserving: a phrase listed twice would emit
        # duplicate identical hit rows and double per-phrase counts
        self.phrases = list(dict.fromkeys(phrases))
        for pid, p in enumerate(self.phrases):
            node = 0
            for ch in p:
                nxt = self.goto[node].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.fail.append(0)
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[node][ch] = nxt
                node = nxt
            self.out[node].append(pid)
        q = deque()
        for ch, nxt in self.goto[0].items():
            q.append(nxt)
        while q:
            node = q.popleft()
            for ch, nxt in self.goto[node].items():
                q.append(nxt)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[nxt] = self.goto[f].get(ch, 0) if self.goto[f].get(ch, 0) != nxt else 0
                self.out[nxt] = self.out[nxt] + self.out[self.fail[nxt]]

    def find_all(self, text: str):
        node = 0
        for i, ch in enumerate(text):
            while node and ch not in self.goto[node]:
                node = self.fail[node]
            node = self.goto[node].get(ch, 0)
            for pid in self.out[node]:
                yield pid, i - len(self.phrases[pid]) + 1

    def find_first(self, text: str) -> dict[int, int]:
        firsts: dict[int, int] = {}
        for pid, start in self.find_all(text):
            if pid not in firsts:
                firsts[pid] = start
            if len(firsts) == len(self.phrases):
                break
        return firsts


# Executor-side automaton cache, keyed by a CONTENT HASH of the phrase
# list (computed once on the driver). Keying by id(bc.value) would be
# unsound: CPython reuses object ids after GC, so two different phrase
# lists in a long-lived executor could collide and silently reuse the
# wrong automaton. The content key also re-hits across separate queries
# over the same dictionary. Bounded (insertion-order eviction): a
# long-lived executor serving rotating per-tenant dictionaries must not
# accumulate one automaton per dictionary forever.
_AC_CACHE: dict[str, ACAutomaton] = {}
_AC_CACHE_MAX = 8


def _ac_cache_key(phrases: list[str]) -> str:
    """Unambiguous content hash: each phrase is length-prefixed, so
    ['a\\x00', 'b'] and ['a', '\\x00b'] — identical under a plain
    '\\x00'.join — hash differently."""
    h = hashlib.sha1()
    for p in phrases:
        enc = p.encode()
        h.update(str(len(enc)).encode())
        h.update(b":")
        h.update(enc)
    return h.hexdigest()


def multi_pattern_scan(
    docs: DataFrame,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "norm_text",
    first_only: bool = False,
) -> DataFrame:
    """(id, phrase, start): occurrences of dictionary phrases in texts.

    first_only=True mirrors the reference FindFirst (one row per
    (doc, phrase), earliest occurrence); otherwise FindAll semantics.
    """
    # the input frame's own session — getActiveSession() is
    # thread-local and None on executor-submitting worker threads
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(list(phrases))
    cache_key = _ac_cache_key(phrases)
    fo = bool(first_only)

    def batch(texts: pd.Series) -> pd.Series:
        key = cache_key
        ac = _AC_CACHE.get(key)
        if ac is None:
            ac = ACAutomaton(bc.value)
            while len(_AC_CACHE) >= _AC_CACHE_MAX:
                _AC_CACHE.pop(next(iter(_AC_CACHE)))
            _AC_CACHE[key] = ac
        out = []
        for t in texts:
            if not t:
                out.append([])
                continue
            if fo:
                hits = [
                    {"phrase": ac.phrases[pid], "start": s}
                    for pid, s in sorted(ac.find_first(t).items())
                ]
            else:
                hits = [
                    {"phrase": ac.phrases[pid], "start": s} for pid, s in ac.find_all(t)
                ]
            out.append(hits)
        return pd.Series(out)

    udf = F.pandas_udf(batch, "array<struct<phrase:string,start:int>>")
    return (
        docs.select(F.col(id_col), F.explode(udf(F.col(text_col))).alias("hit"))
        .select(id_col, F.col("hit.phrase").alias("phrase"), F.col("hit.start").alias("start"))
    )


def contains_any(
    docs: DataFrame,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "norm_text",
    result_col: str = "has_any",
) -> DataFrame:
    """(id, has_any): does the text contain ANY dictionary phrase?

    The reference's ContainsAny (StringSearch.cs:362-442) is the
    boolean early-exit variant of the AC scan. Spark-side the right
    tool is NOT the Python automaton: a JVM ``exists`` over a literal
    phrase array short-circuits on the first hit inside whole-stage
    codegen — zero Python, zero shuffle, and Catalyst can push the
    projection into the scan. (For >10^4 phrases, fall back to
    multi_pattern_scan + groupBy-any, where the automaton amortizes.)
    """
    arr = F.array(*[F.lit(p) for p in phrases])
    return docs.select(
        F.col(id_col),
        # NULL text => strictly False, like the reference's boolean
        # ContainsAny (a bare exists yields NULL, which a ~filter on
        # the "without any phrase" branch would silently drop)
        F.coalesce(
            F.exists(arr, lambda p: F.instr(F.col(text_col), p) > 0),
            F.lit(False),
        ).alias(result_col),
    )
