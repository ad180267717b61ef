"""BPE tokenizer training (operators/bpe.py): distributed word counts,
driver merge learning on the vocabulary-sized table, Arrow-batched encode."""

from dataprofiler_spark.operators.bpe import (
    END,
    encode_word,
    learn_merges,
    train_bpe,
    word_counts,
)



def test_learn_merges_textbook():
    """The canonical BPE example: most frequent adjacent pair merges
    first, ties break lexicographically, merges compose."""
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_merges(counts, 4)
    # 'es' appears in newest(6)+widest(3)=9 — the top pair; then 'est',
    # then 'est</w>' (9), then 'lo' (7)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    assert merges[3] == ("l", "o")


def test_encode_roundtrip_and_determinism():
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_merges(counts, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    toks = encode_word("newest", ranks)
    assert "".join(toks) == "newest" + END  # lossless
    assert encode_word("newest", ranks) == toks  # deterministic
    # an unseen word still encodes (to finer pieces), losslessly
    assert "".join(encode_word("lowest", ranks)) == "lowest" + END
    # identical counts -> identical merges on rerun
    assert learn_merges(counts, 10) == merges


def test_train_bpe_end_to_end(spark):
    """Distributed counts feed the learner; the encode UDF tokenizes a
    frame; vocabulary compresses the corpus (fewer tokens than chars)."""
    from pyspark.sql import functions as F

    from dataprofiler_spark.operators.bpe import bpe_encode_udf

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat the cat ran") for i in range(20)]
        + [(100 + i, "a dog ate the food") for i in range(10)],
        "doc_id long, text string",
    )
    wc = {r.w: r.cnt for r in word_counts(docs).collect()}
    assert wc["the"] == 20 * 3 + 10 and wc["cat"] == 40

    merges = train_bpe(docs, 30)
    ranks = {p: i for i, p in enumerate(merges)}
    # the most frequent word compresses to ONE token within 30 merges
    assert encode_word("the", ranks) == ["the" + END]

    enc = bpe_encode_udf(merges)
    out = docs.select("doc_id", enc(F.col("text")).alias("toks")).collect()
    row = next(r for r in out if r.doc_id == 0)
    joined = "".join(row.toks).replace(END, "")
    assert joined == "the cat sat on the mat the cat ran".replace(" ", "")
    # with 30 merges over this tiny vocab, frequent words become 1 token
    n_tokens = len(row.toks)
    n_chars = len("the cat sat on the mat the cat ran".replace(" ", ""))
    assert n_tokens < n_chars / 2  # real compression, not char-splitting


def test_empty_and_null_inputs(spark):
    from pyspark.sql import functions as F

    from dataprofiler_spark.operators.bpe import bpe_encode_udf

    assert learn_merges([], 5) == []
    docs = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    assert word_counts(docs).count() == 0
    enc = bpe_encode_udf([("a", "b")])
    rows = {r.doc_id: r.toks for r in
            docs.select("doc_id", enc(F.col("text")).alias("toks")).collect()}
    assert rows[1] is None and rows[2] == []


def test_heap_learner_equals_naive_reference():
    """The lazy-invalidation heap must select exactly the same merge
    sequence as a brute-force highest-count/smallest-pair scan, on
    randomized corpora (hypothesis)."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def naive_merges(counts, num_merges):
        words = [list(w) + [END] for w, _ in counts]
        freqs = [c for _, c in counts]
        out = []
        for _ in range(num_merges):
            pc = Counter()
            for syms, f in zip(words, freqs):
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] += f
            if not pc:
                break
            maxc = max(pc.values())
            best = min(p for p, c in pc.items() if c == maxc)
            out.append(best)
            merged = best[0] + best[1]
            for i, syms in enumerate(words):
                ns, j = [], 0
                while j < len(syms):
                    if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                        ns.append(merged)
                        j += 2
                    else:
                        ns.append(syms[j])
                        j += 1
                words[i] = ns
        return out

    @given(
        st.lists(
            st.tuples(st.text(alphabet="abcd", min_size=1, max_size=6),
                      st.integers(1, 9)),
            min_size=1, max_size=12, unique_by=lambda t: t[0],
        ),
        st.integers(1, 8),
    )
    @settings(max_examples=60, deadline=None)
    def check(counts, k):
        assert learn_merges(counts, k) == naive_merges(counts, k)

    check()


def test_train_bpe_vocab_cap(spark):
    """The vocabulary collect is bounded: a non-binding max_vocab/min_count
    leaves the merge sequence bit-identical; a binding max_vocab keeps the
    top words by (count desc, word) and still learns their merges."""
    docs = spark.createDataFrame(
        [(i, "aa bb aa cc dd ee ff gg") for i in range(6)]
        + [(100, "zz yy xx ww vv uu tt ss rr qq")],
        "doc_id long, text string",
    )
    unbounded = train_bpe(docs, 12)  # defaults: min_count=1, cap 10^6
    assert train_bpe(docs, 12, max_vocab=10_000, min_count=1) == unbounded

    # binding cap: only the 3 most frequent words survive the collect —
    # merges can only involve their characters
    capped = train_bpe(docs, 12, max_vocab=3)
    syms = {s for pair in capped for s in pair}
    assert syms and all(set(s.replace(END, "")) <= set("abcd") for s in syms), capped
