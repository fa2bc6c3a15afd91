"""BPE trainer/encoder (llm/bpe.py) vs a textbook pure-Python reference:
identical merge sequences (including tie-breaks), layout independence,
and encode replay equivalence."""

from __future__ import annotations

from collections import Counter

import pytest


def _ref_bpe(texts, n_merges, min_freq=2):
    """Textbook BPE (Sennrich et al. 2016, alg. 1): word-freq dict, per
    iteration count adjacent pairs, merge the (freq DESC, pair ASC) max
    everywhere, leftmost non-overlapping."""
    wc = Counter(w for t in texts for w in t.lower().split())
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in wc.items()}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pc[p] += c
        cand = {p: f for p, f in pc.items() if f >= min_freq}
        if not cand:
            break
        best_f = max(cand.values())
        a, b = min(p for p, f in cand.items() if f == best_f)
        merges.append((a, b, best_f))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges, vocab


_CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
    "the new low deal is the widest deal",  # ties + singles
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(t,) for t in _CORPUS], "text string")


def test_bpe_train_matches_reference(corpus_df):
    from sclera_spark.llm.bpe import bpe_train

    got = bpe_train(corpus_df, "text", n_merges=25, min_freq=2)
    want, _vocab = _ref_bpe(_CORPUS, 25, min_freq=2)
    assert got == want, (
        f"merge sequences diverge at "
        f"{next(i for i, (g, w) in enumerate(zip(got, want)) if g != w)}"
    )
    # early-stop honored: reference stopped below n_merges or matched
    assert len(got) == len(want) <= 25


def test_bpe_train_layout_independent(corpus_df):
    from sclera_spark.llm.bpe import bpe_train

    base = bpe_train(corpus_df, "text", n_merges=12)
    shuffled = bpe_train(corpus_df.repartition(7), "text", n_merges=12)
    assert base == shuffled


def test_bpe_encode_replays_training_segmentation(spark, corpus_df):
    from sclera_spark.llm.bpe import bpe_encode, bpe_train

    merges = bpe_train(corpus_df, "text", n_merges=20)
    _ref_merges, vocab = _ref_bpe(_CORPUS, 20)
    # the trained segmentation of every corpus word, from the reference
    seg = {"".join(s).replace("</w>", ""): list(s) for s in vocab}

    out = bpe_encode(corpus_df, "text", merges).collect()
    for row in out:
        toks = row.bpe_tokens
        # round trip: tokens re-join to the original words
        rejoined = "".join(toks).replace("</w>", " ").split()
        assert rejoined == row.text.lower().split()
        # replay equivalence: per-word segmentation == training end state
        i = 0
        for w in row.text.lower().split():
            n = len(seg[w])
            assert toks[i : i + n] == seg[w], f"word {w!r} segmented differently"
            i += n


def test_bpe_encode_null_and_unseen(spark):
    from sclera_spark.llm.bpe import bpe_encode, bpe_train

    train = spark.createDataFrame([("aa ab aa",)], "text string")
    merges = bpe_train(train, "text", n_merges=5, min_freq=2)
    df = spark.createDataFrame([("aa zq",), (None,)], "text string")
    rows = bpe_encode(df, "text", merges).collect()
    by_text = {r.text: r.bpe_tokens for r in rows}
    assert by_text[None] is None
    # unseen word falls back to finer symbols but still round-trips
    assert "".join(by_text["aa zq"]).replace("</w>", " ").split() == ["aa", "zq"]


def test_bpe_driver_strategy_matches_reference_1000_merges(spark):
    """r7 (verdict #4): the driver-side incremental learner must train a
    large merge list in O(1) driver round trips while exactly matching
    the textbook sequential reference — including every tie-break."""
    from sclera_spark.llm.bpe import TRAIN_STATS, bpe_train

    # a corpus rich enough to sustain ~1000 merges
    texts = []
    for i in range(400):
        texts.append(
            f"alpha{i % 37} beta{i % 23} gamma{i % 11} delta epsilon "
            f"zeta{i % 7}x eta theta iota kappa{i % 5}"
        )
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_train(df, "text", n_merges=1000, min_freq=2)
    assert TRAIN_STATS["strategy"] == "driver"
    assert TRAIN_STATS["driver_rounds"] <= 100  # actually 2: count+collect
    want, _ = _ref_bpe(texts, 1000, min_freq=2)
    assert len(got) == len(want)
    diverge = next(
        (i for i, (g, w) in enumerate(zip(got, want)) if g != w), None
    )
    assert diverge is None, f"diverged at merge {diverge}: {got[diverge]} vs {want[diverge]}"


def test_bpe_strategies_identical(corpus_df):
    """driver and distributed strategies are the same algorithm — the
    merge lists must be equal element-for-element."""
    from sclera_spark.llm.bpe import TRAIN_STATS, bpe_train

    drv = bpe_train(corpus_df, "text", n_merges=25, strategy="driver")
    assert TRAIN_STATS["strategy"] == "driver"
    dist = bpe_train(corpus_df, "text", n_merges=25, strategy="distributed")
    assert TRAIN_STATS["strategy"] == "distributed"
    assert drv == dist


def test_bpe_driver_strategy_vocab_cap(corpus_df):
    from sclera_spark.llm.bpe import bpe_train

    with pytest.raises(ValueError, match="max_driver_vocab"):
        bpe_train(corpus_df, "text", n_merges=5, strategy="driver",
                  max_driver_vocab=3)
    # auto falls back to the distributed loop instead of failing
    got = bpe_train(corpus_df, "text", n_merges=5, max_driver_vocab=3)
    assert len(got) == 5
