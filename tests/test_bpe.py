"""ext_bpe_merges: the distributed BPE loop must learn EXACTLY the rules a
pure-Python reference implementation learns on the same corpus (frequency-
then-lexicographic argmax, left-to-right non-overlapping application)."""

from __future__ import annotations

import re
from collections import Counter


def _reference_bpe(texts: list[str], n_merges: int):
    wf = Counter()
    for t in texts:
        for w in re.sub("[^a-z]+", " ", t.lower()).split():
            wf[w] += 1
    sym = {w: " ".join(list(w)) for w in wf}
    out = []
    for step in range(1, n_merges + 1):
        pc = Counter()
        for w, f in wf.items():
            s = sym[w].split(" ")
            for a, b in zip(s, s[1:]):
                pc[f"{a} {b}"] += f
        if not pc:
            break
        best = max(pc.items(), key=lambda kv: (kv[1], ), default=None)
        top_n = max(pc.values())
        pair = min(p for p, n in pc.items() if n == top_n)
        out.append((step, pair, top_n))
        a, b = pair.split(" ")
        pat = re.compile(rf"(?<!\S){re.escape(a)} {re.escape(b)}(?!\S)")
        for w in sym:
            sym[w] = pat.sub(a + b, sym[w])
    return out


def test_bpe_matches_reference(spark, sf_dir):
    from agentic_data_pipeline_spark.catalog import load_table
    from agentic_data_pipeline_spark.operators.text import bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    expect = _reference_bpe(texts, 5)
    got = bpe_merges(docs, "text", n_merges=5)
    assert got == expect and len(got) == 5


def test_bpe_merge_application_order(spark):
    """'a b a b' must merge to 'ab ab' (non-overlapping left-to-right) and
    a learned merge must feed the next round's pairs."""
    df = spark.createDataFrame([("abab abab ab",)], "text string")
    from agentic_data_pipeline_spark.operators.text import bpe_merges

    got = bpe_merges(df, "text", n_merges=2)
    # round 1: 'a b' (freq 5: two per 'abab' x2 + one 'ab');
    # round 2: 'ab ab' inside the two 'abab' words (freq 2)
    assert got[0][1] == "a b" and got[0][2] == 5
    assert got[1][1] == "ab ab" and got[1][2] == 2


def _reference_encode(texts: list[str], merges) -> Counter:
    """Token histogram under the learned merges (pure Python)."""
    wf = Counter()
    for t in texts:
        for w in re.sub("[^a-z]+", " ", t.lower()).split():
            wf[w] += 1
    hist = Counter()
    pats = [(re.compile(rf"(?<!\S){re.escape(a)} {re.escape(b)}(?!\S)"), a + b)
            for _, pair, _ in merges for a, b in [pair.split(" ")]]
    for w, f in wf.items():
        s = " ".join(list(w))
        for pat, rep in pats:
            s = pat.sub(rep, s)
        for tok in s.split(" "):
            hist[tok] += f
    return hist


def test_bpe_encode_matches_reference(spark, sf_dir):
    from agentic_data_pipeline_spark.catalog import load_table
    from agentic_data_pipeline_spark.operators.text import bpe_encode, bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    merges = bpe_merges(docs, "text", n_merges=5)
    expect = _reference_encode(texts, merges)
    got = {r["token"]: r["n_occurrences"]
           for r in bpe_encode(docs, merges, "text").collect()}
    assert got == dict(expect)
    # merged symbols actually appear as tokens (the encoder applied rules)
    merged_syms = {p.replace(" ", "") for _, p, _ in merges}
    assert merged_syms & set(got)


def test_bpe_encode_application_order(spark):
    """Encoding must reuse training's left-to-right non-overlapping order:
    'a b'→'ab' turns 'a b a b' into 'ab ab', then 'ab ab'→'abab' — so
    'abab' encodes to one token while the bare 'ab' word stays 'ab'."""
    from agentic_data_pipeline_spark.operators.text import bpe_encode

    df = spark.createDataFrame([("abab abab ab",)], "text string")
    merges = [(1, "a b", 5), (2, "ab ab", 2)]
    got = {r["token"]: r["n_occurrences"]
           for r in bpe_encode(df, merges, "text").collect()}
    assert got == {"abab": 2, "ab": 1}
