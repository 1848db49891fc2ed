from __future__ import annotations

import random

from entitymatch_spark.operators.textsearch import ACAutomaton, multi_pattern_scan


def _brute_all(text: str, phrases: list[str]):
    hits = set()
    for p in phrases:
        start = 0
        while True:
            i = text.find(p, start)
            if i < 0:
                break
            hits.add((p, i))
            start = i + 1
    return hits


def test_ac_automaton_vs_bruteforce():
    rng = random.Random(9)
    phrases = ["ab", "abc", "bca", "ca", "aaa", "she", "he", "hers"]
    for _ in range(200):
        text = "".join(rng.choice("abcshers ") for _ in range(rng.randint(0, 60)))
        ac = ACAutomaton(phrases)
        got = {(ac.phrases[pid], s) for pid, s in ac.find_all(text)}
        assert got == _brute_all(text, phrases), text


def test_ac_find_first():
    ac = ACAutomaton(["he", "she", "hers"])
    firsts = ac.find_first("ushers she")
    got = {ac.phrases[pid]: s for pid, s in firsts.items()}
    assert got == {"she": 1, "he": 2, "hers": 2}


def test_multi_pattern_scan_df(spark):
    docs = spark.createDataFrame(
        [(1, "the table scan beats the hash join"), (2, "no patterns here"), (3, None)],
        "doc_id long, norm_text string",
    )
    out = multi_pattern_scan(docs, ["table scan", "hash join", "the"], first_only=False)
    rows = {(r["doc_id"], r["phrase"], r["start"]) for r in out.collect()}
    assert (1, "table scan", 4) in rows and (1, "hash join", 25) in rows
    assert (1, "the", 0) in rows and (1, "the", 21) in rows
    assert not any(d in (2, 3) for d, _, _ in rows)
    first = multi_pattern_scan(docs, ["the"], first_only=True)
    assert [(r["doc_id"], r["start"]) for r in first.collect()] == [(1, 0)]


def test_ac_cache_key_unambiguous_and_bounded():
    """['a\\x00','b'] and ['a','\\x00b'] joined with NUL are identical
    strings — the length-prefixed key must distinguish them, or an
    executor silently reuses the WRONG automaton across scans. The
    cache is also bounded so rotating dictionaries can't grow it
    forever."""
    from entitymatch_spark.operators.textsearch import (
        _AC_CACHE_MAX,
        _ac_cache_key,
    )

    assert _ac_cache_key(["a\x00", "b"]) != _ac_cache_key(["a", "\x00b"])
    assert _ac_cache_key(["ab"]) != _ac_cache_key(["a", "b"])
    assert _ac_cache_key(["a", "b"]) == _ac_cache_key(["a", "b"])
    assert _AC_CACHE_MAX >= 2


def test_contains_any_null_text_is_false(spark):
    from entitymatch_spark.operators.textsearch import contains_any

    docs = spark.createDataFrame(
        [(1, "has table scan"), (2, "nothing"), (3, None)],
        "doc_id long, norm_text string",
    )
    got = {
        r["doc_id"]: r["has_any"]
        for r in contains_any(docs, ["table"]).collect()
    }
    assert got == {1: True, 2: False, 3: False}  # strictly boolean


def test_automaton_rejects_empty_and_dedups(spark):
    import pytest

    from entitymatch_spark.operators.textsearch import (
        ACAutomaton,
        multi_pattern_scan,
    )

    with pytest.raises(ValueError, match="empty"):
        ACAutomaton(["ab", ""])
    docs = spark.createDataFrame([(1, "zabab")], "doc_id long, norm_text string")
    rows = multi_pattern_scan(docs, ["ab", "ab"]).collect()
    # duplicate dictionary entries emit each occurrence ONCE
    assert sorted(r["start"] for r in rows) == [1, 3]
