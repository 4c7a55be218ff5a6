"""BPE merge learning: worked example + property equivalence to the
textbook greedy algorithm (validates the two-pass replace merge)."""

import re
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from sensordatapipelines_spark.operators.text import (
    BPE_PATTERN,
    bpe_learn_merges,
    bpe_segment_counts,
)


def _py_bpe(texts: list[str], n_merges: int, min_count: int = 2):
    """Pure-Python textbook reference: greedy left-to-right non-overlapping
    merge over word types, most-frequent pair first, lexicographic ties."""
    counts = Counter(w for t in texts for w in re.findall(BPE_PATTERN, t))
    vocab = {w: list(w) for w in counts}
    merges = []
    for rank in range(1, n_merges + 1):
        pair_tot: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pair_tot[(syms[i], syms[i + 1])] += counts[w]
        if not pair_tot:
            break
        (a, b), tot = min(pair_tot.items(), key=lambda kv: (-kv[1], kv[0]))
        if tot < min_count:
            break
        merges.append((rank, a, b, tot))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def test_worked_example(spark):
    df = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new low")],
        "doc_id long, text string",
    )
    got = [
        (r.rank, r.left, r.right, r.pair_count, r.token)
        for r in bpe_learn_merges(df, n_merges=4).orderBy("rank").collect()
    ]
    assert got == [
        (1, "l", "o", 6, "lo"),
        (2, "lo", "w", 6, "low"),
        (3, "e", "w", 4, "ew"),
        (4, "n", "ew", 4, "new"),
    ]


def test_segment_counts_worked_example(spark):
    df = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new low")],
        "doc_id long, text string",
    )
    m = bpe_learn_merges(df, n_merges=6)
    out = {
        r.doc_id: (r.n_words, r.n_symbols)
        for r in bpe_segment_counts(df, m).collect()
    }
    # doc1: low,low,low=1 sym each; lower=[low,er]; lowest=[low,es,t]
    # doc2: new,new=1; newer=[new,er]; newest=[new,es,t]; low=1
    assert out == {1: (5, 8), 2: (5, 8)}


# Random corpora over a tiny alphabet force heavy pair overlap (runs of
# identical symbols) — exactly the cases where a naive one-pass string
# replace would diverge from the textbook greedy merge.
@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="aab", min_size=1, max_size=6), min_size=1, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=4,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_property_matches_textbook_greedy(spark, texts, n_merges):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    expect, vocab = _py_bpe(texts, n_merges)
    got = [
        (r.rank, r.left, r.right, int(r.pair_count))
        for r in bpe_learn_merges(df, n_merges=n_merges).orderBy("rank").collect()
    ]
    assert got == expect
    # Segment counts must match the reference vocab's symbol counts too.
    word_syms = {w: len(s) for w, s in vocab.items()}
    exp_counts = {}
    for i, t in enumerate(texts):
        ws = re.findall(BPE_PATTERN, t)
        if ws:
            exp_counts[i] = (len(ws), sum(word_syms[w] for w in ws))
    m = bpe_learn_merges(df, n_merges=n_merges)
    out = {
        r.doc_id: (r.n_words, r.n_symbols)
        for r in bpe_segment_counts(df, m).collect()
    }
    assert out == exp_counts
