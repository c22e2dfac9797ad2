"""Curation ops: repetition signals, stratified sampling, PII redaction.

Each op's Ray kernel is checked against (a) hand-computed expectations and
(b) the DuckDB formulation used by the driver oracle — on adversarial
inputs the sf tables don't contain (PII spans, empty docs, heavy repeats).
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from sbustreamspot_core_ray.stages.curation import (
    PiiRedact,
    RepetitionSignals,
    sample_bucket,
    stratified_sample,
)


def _docs_ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] if len(r) > 2 else "en" for r in rows]),
            }
        )
    )


def test_repetition_signals_hand_cases():
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "a a a b",          # 4 words, 2 distinct, top=3; bigrams: aa aa ab -> top 2/3
                "x",                # 1 word, no bigrams
                "",                 # empty
                "p q p q p",        # 5 words, top=3; bigrams pq qp pq qp -> top 2/4
            ],
        }
    )
    out = RepetitionSignals()(df)
    assert out["n_words"].tolist() == [4, 1, 0, 5]
    assert out["distinct_word_frac"].tolist() == [0.5, 1.0, 0.0, 0.4]
    assert out["top_word_frac"].tolist() == [0.75, 1.0, 0.0, 0.6]
    assert out["top_bigram_frac"].tolist() == [
        round(2 / 3, 6),
        0.0,
        0.0,
        0.5,
    ]


def test_repetition_signals_matches_duckdb():
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "x"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 30))))
        for _ in range(60)
    ] + ["", "   ", "solo"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    got = (
        RepetitionSignals()(df).sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    import __ray_entry__ as E

    want = con.sql(E.oracle_sql()["repetition_signals"]).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sample_bucket_matches_hugeint_formula():
    ids = np.array([0, 1, 2, 17, 499, 123456789, 2**40 + 3], np.int64)
    got = sample_bucket(ids)
    want = [
        int((((i * 11400714819323198485) % 2**64) // 2**32) % 10000)
        for i in ids.tolist()
    ]
    assert got.tolist() == want


def test_stratified_sample_rates_and_determinism():
    rows = [(i, "t", ["en", "de", "zh"][i % 3]) for i in range(3000)]
    rates = {"en": 0, "de": 5000}
    out1 = stratified_sample(_docs_ds(rows), rates).to_pandas()
    out2 = stratified_sample(_docs_ds(rows), rates).to_pandas()
    pd.testing.assert_frame_equal(
        out1.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True),
    )
    by_lang = out1.groupby("lang").size()
    assert "en" not in by_lang  # rate 0 drops everything
    assert by_lang["zh"] == 1000  # default rate keeps everything
    assert 350 <= by_lang["de"] <= 650  # ~50% of 1000


PII_CASES = [
    "contact john.doe+spam@sub.example.co.uk or x@y.io today",
    "call 555-867-5309 or 212.555.1234 now",
    "server at 192.168.1.1 and 10.0.0.255, not 1234.5.6.7890",
    "mixed bob@corp.com 303-555-0000 172.16.0.1 end",
    "no pii here at all",
    "",
    "edge a@b.cd trailing@dot. 999-999-99999",
]


def test_pii_redact_counts_and_duckdb_parity():
    df = pd.DataFrame({"doc_id": np.arange(len(PII_CASES)), "text": PII_CASES})
    got = PiiRedact()(df)
    assert got["n_emails"].tolist()[0] == 2
    assert got["n_phones"].tolist()[1] == 2
    assert got["n_ipv4"].tolist()[2] == 2
    assert got.loc[4, ["n_emails", "n_phones", "n_ipv4"]].tolist() == [0, 0, 0]
    con = duckdb.connect()
    con.register("documents", df)
    import __ray_entry__ as E

    want = con.sql(E.oracle_sql()["pii_redact"]).df()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        want,
        check_dtype=False,
    )


def test_pii_redact_order_dependence():
    # a phone-shaped string adjacent to an email must not double-count:
    # the email is redacted first, the remainder re-scanned
    df = pd.DataFrame({"doc_id": [0], "text": ["a 555-123-4567@mail.com b"]})
    out = PiiRedact()(df)
    assert out["n_emails"][0] == 1
    assert out["n_phones"][0] == 0


def test_doc_word_ngrams_hand_cases():
    from sbustreamspot_core_ray.stages.curation import doc_word_ngrams

    grams, counts = doc_word_ngrams(["a b c d e f", "x y", ""], n=5)
    assert counts.tolist() == [2, 0, 0]
    assert grams.tolist() == ["a b c d e", "b c d e f"]


def test_decontaminate_hand_case():
    from sbustreamspot_core_ray.stages.curation import decontaminate

    bench = _docs_ds([(0, "one two three four five six")])
    corpus = _docs_ds(
        [
            (1, "zero one two three four five seven"),  # shares 'one..five'
            (2, "totally different words here with no overlap at all"),
            (3, "shorty"),  # < 5 words -> 0 grams
        ]
    )
    out = (
        decontaminate(corpus, bench)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "matched_grams"] == 1  # "one two three four five"
    assert out.loc[1, "contaminated"] == 1
    assert out.loc[1, "n_grams"] == 3
    assert out.loc[2, "matched_grams"] == 0
    assert out.loc[2, "contaminated"] == 0
    assert out.loc[3, "n_grams"] == 0
    assert out.loc[3, "contamination_frac"] == 0.0


def test_decontaminate_matches_duckdb():
    rng = np.random.default_rng(11)
    vocab = np.array("a b c d e f g h i j".split())
    rows = []
    for i in range(60):
        n = int(rng.integers(0, 30))
        rows.append((i, " ".join(rng.choice(vocab, n))))
    from sbustreamspot_core_ray.stages.curation import decontaminate

    ds = _docs_ds(rows)
    bench = ds.filter(lambda r: r["doc_id"] % 7 == 0)
    corpus = ds.filter(lambda r: r["doc_id"] % 7 != 0)
    got = (
        decontaminate(corpus, bench)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = con.execute(r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
  FROM documents WHERE trim(text) <> ''
), bg AS (
  SELECT DISTINCT array_to_string(words[i:i+4], ' ') AS gram
  FROM w, UNNEST(range(1, len(words) - 3)) AS t(i)
  WHERE doc_id % 7 = 0 AND len(words) >= 5
), cg AS (
  SELECT doc_id, array_to_string(words[i:i+4], ' ') AS gram
  FROM w, UNNEST(range(1, len(words) - 3)) AS t(i)
  WHERE doc_id % 7 <> 0 AND len(words) >= 5
), m AS (
  SELECT doc_id, count(*) AS n_grams,
         count(*) FILTER (WHERE gram IN (SELECT gram FROM bg)) AS matched
  FROM cg GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(m.n_grams, 0) AS n_grams,
  COALESCE(m.matched, 0) AS matched_grams,
  CAST(CASE WHEN COALESCE(m.matched, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
    AS contaminated,
  ROUND(COALESCE(CAST(m.matched AS DOUBLE) / m.n_grams, 0.0), 6)
    AS contamination_frac
FROM documents d LEFT JOIN m USING (doc_id)
WHERE d.doc_id % 7 <> 0 ORDER BY d.doc_id
""").df()
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False
    )


def test_term_doc_freq_hand_case():
    from sbustreamspot_core_ray.stages.text import term_doc_freq

    docs = ray.data.from_items(
        [
            {"text": "The cat  sat"},          # double space -> empty token dropped
            {"text": "cat cat dog"},           # repeated term counts once per doc
            {"text": ""},
            {"text": "Dog runs"},
        ]
    )
    out = term_doc_freq(docs, top_n=3).to_pandas()
    # df: cat 2, dog 2, runs/sat/the 1 -> top3 = cat, dog, then 'runs'
    assert list(out["term"]) == ["cat", "dog", "runs"]
    assert list(out["df"]) == [2, 2, 1]


def test_lang_token_percentiles_matches_duckdb():
    from sbustreamspot_core_ray.stages.text import lang_token_percentiles

    rng = np.random.Generator(np.random.PCG64(3))
    rows = [
        {
            "lang": ["en", "de", "fr"][int(rng.integers(3))],
            "text": " ".join(["w"] * int(rng.integers(0, 40))),
        }
        for _ in range(300)
    ]
    out = (
        lang_token_percentiles(ray.data.from_items(rows))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows))
    want = con.execute(
        r"""
WITH tc AS (
  SELECT lang,
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS ws_tokens
  FROM documents
), r AS (
  SELECT lang, ws_tokens,
         row_number() OVER (PARTITION BY lang ORDER BY ws_tokens) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM tc
)
SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
  CAST(max(CASE WHEN rn = CAST(ceil(0.5e0 * n) AS BIGINT) THEN ws_tokens END)
       AS BIGINT) AS p50,
  CAST(max(CASE WHEN rn = CAST(ceil(0.9e0 * n) AS BIGINT) THEN ws_tokens END)
       AS BIGINT) AS p90,
  CAST(max(CASE WHEN rn = CAST(ceil(0.99e0 * n) AS BIGINT) THEN ws_tokens END)
       AS BIGINT) AS p99
FROM r GROUP BY lang ORDER BY lang
"""
    ).df()
    pd.testing.assert_frame_equal(
        out[["lang", "n_docs", "p50", "p90", "p99"]],
        want,
        check_dtype=False,
    )


def test_bm25_search_matches_duckdb():
    from sbustreamspot_core_ray.stages.text import bm25_search

    rng = np.random.Generator(np.random.PCG64(5))
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(
                vocab[int(j)] for j in rng.integers(0, len(vocab), rng.integers(1, 30))
            ),
        }
        for i in range(200)
    ]
    terms = ("alpha", "zeta")
    out = bm25_search(ray.data.from_items(rows), terms, top_n=20).to_pandas()
    out = out.reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows))
    import math
    base = con.execute("""
      WITH tok AS (SELECT doc_id,
            list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
            FROM documents)
      SELECT doc_id, len(ts) AS dl,
             len(list_filter(ts, t -> t = 'alpha')) AS tf0,
             len(list_filter(ts, t -> t = 'zeta')) AS tf1
      FROM tok""").df()
    n = len(base); sdl = int(base["dl"].sum()); avgdl = float(sdl) / n
    score = np.zeros(n)
    for i in range(2):
        df_i = int((base[f"tf{i}"] > 0).sum())
        idf = math.log((n - df_i + 0.5) / (df_i + 0.5) + 1.0)
        tf = base[f"tf{i}"].to_numpy(np.int64)
        score = score + idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (base["dl"].to_numpy(np.int64) / avgdl)))
    base["score"] = score
    want = (
        base[base["score"] > 0.0]
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(20)[["doc_id", "score"]]
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == list(want["doc_id"])
    assert np.array_equal(out["score"].to_numpy(), want["score"].to_numpy())  # bit-exact


def test_group_sample_exact_n_and_deterministic():
    from sbustreamspot_core_ray.stages.curation import FIB_MIX, group_sample

    rows = [{"doc_id": i, "lang": ["en", "de"][i % 2]} for i in range(200)]
    out = group_sample(ray.data.from_items(rows), n_per_group=10).to_pandas()
    assert len(out) == 20
    assert (out.groupby("lang").size() == 10).all()
    # the kept ids per group are exactly the 10 with the smallest hash
    import numpy as np
    ids = np.arange(200, dtype=np.int64)
    with np.errstate(over="ignore"):
        h = ids.astype(np.uint64) * FIB_MIX
    for lang, par in (("en", 0), ("de", 1)):
        grp = ids[ids % 2 == par]
        want = set(grp[np.argsort(h[grp])][:10].tolist())
        got = set(out[out["lang"] == lang]["doc_id"].tolist())
        assert got == want
    # determinism across runs/partitionings
    out2 = group_sample(
        ray.data.from_items(rows).repartition(7), n_per_group=10
    ).to_pandas()
    assert set(map(tuple, out2[["doc_id", "lang"]].to_numpy())) == set(
        map(tuple, out[["doc_id", "lang"]].to_numpy())
    )


def test_unigram_logprob_exact():
    """Hand-checked nanonat sums: vocab cut, OOV floor, empty doc."""
    import math

    import pyarrow as pa
    import ray.data

    from sbustreamspot_core_ray.stages.text import unigram_logprob

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                # counts: a=3, b=2, c=1 -> C=6; top_v=2 keeps a,b; c is OOV
                "text": pa.array(["a a b", "a b c", ""]),
            }
        )
    )
    out = (
        unigram_logprob(docs, top_v=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    qa = math.floor(math.log(3 / 6.0) * 1e9 + 0.5)
    qb = math.floor(math.log(2 / 6.0) * 1e9 + 0.5)
    qoov = math.floor(math.log(1.0 / 6.0) * 1e9 + 0.5)
    assert out.loc[1, "n_tokens"] == 3 and out.loc[1, "logprob_e9"] == 2 * qa + qb
    assert out.loc[2, "logprob_e9"] == qa + qb + qoov
    assert out.loc[3, "n_tokens"] == 0 and out.loc[3, "logprob_e9"] == 0


def test_bigram_logprob_exact():
    """Hand-checked conditional nanonat sums; <2-token docs score (0, 0);
    empty tokens from double spaces are dropped BEFORE pairing."""
    import math

    import pyarrow as pa
    import ray.data

    from sbustreamspot_core_ray.stages.text import bigram_logprob

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                # corpus bigrams: doc1 "a  b a" -> (a,b),(b,a) [double space
                # dropped]; doc2 "a b b" -> (a,b),(b,b); doc3 one token;
                # doc4 empty. counts: (a,b)=2, (b,a)=1, (b,b)=1;
                # left: a=2, b=2.
                "text": pa.array(["a  b a", "a b b", "x", ""]),
            }
        )
    )
    out = bigram_logprob(docs).to_pandas().set_index("doc_id").sort_index()
    qab = math.floor(math.log(2 / 2.0) * 1e9 + 0.5)
    qba = math.floor(math.log(1 / 2.0) * 1e9 + 0.5)
    qbb = math.floor(math.log(1 / 2.0) * 1e9 + 0.5)
    assert out.loc[1, "n_bigrams"] == 2 and out.loc[1, "logprob_e9"] == qab + qba
    assert out.loc[2, "n_bigrams"] == 2 and out.loc[2, "logprob_e9"] == qab + qbb
    assert out.loc[3, "n_bigrams"] == 0 and out.loc[3, "logprob_e9"] == 0
    assert out.loc[4, "n_bigrams"] == 0 and out.loc[4, "logprob_e9"] == 0


def test_chunk_documents():
    import pyarrow as pa

    import ray.data

    from sbustreamspot_core_ray.stages.text import chunk_documents

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                # doc 1: 5 tokens (double space collapses), chunk size 2
                "text": pa.array(["a b  c d e", "x", ""]),
            }
        )
    )
    out = (
        chunk_documents(docs, chunk_tokens=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    got = list(zip(out["doc_id"], out["chunk_id"], out["n_tokens"], out["chunk_text"]))
    assert got == [
        (1, 0, 2, "a b"),
        (1, 1, 2, "c d"),
        (1, 2, 1, "e"),
        (2, 0, 1, "x"),
    ]


def test_corpus_manifest_dedup_filter_rollup():
    """Three docs: an English pair of exact duplicates (first wins), one
    too-short doc dropped by the token floor."""
    import pyarrow as pa

    import ray.data

    from sbustreamspot_core_ray.stages.curation import corpus_manifest

    en = "the cat and the dog of the house is that it in a barn " * 3
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "source": pa.array(["web", "web", "web"], pa.string()),
                "text": pa.array([en, en, "the and of"], pa.string()),
            }
        )
    )
    out = corpus_manifest(docs, num_parts=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["source"] == "web" and r["lang_pred"] == "en"
    assert r["n_docs"] == 1  # dup dropped, short doc dropped
    assert r["tokens"] == len(en.split())


def test_term_total_freq_zipf_head():
    import pyarrow as pa

    import ray.data

    from sbustreamspot_core_ray.stages.text import term_total_freq

    docs = ray.data.from_arrow(
        pa.table(
            {"text": pa.array(["a b a", "a c", "b"], pa.string())}
        )
    )
    t = term_total_freq(docs, top_n=10).to_pandas().set_index("term")["tf"]
    assert t.loc["a"] == 3 and t.loc["b"] == 2 and t.loc["c"] == 1


def test_budget_fill_priority_and_boundary():
    """Hand-checked priority order and the exact budget boundary: the doc
    that lands cum == budget is kept; the NEXT doc in priority order is
    dropped and — prefix semantics — so is everything after it, even docs
    that would individually fit. sub_docs=2 forces multi-bucket bases."""
    from sbustreamspot_core_ray.stages.curation import budget_fill

    rows = [
        # (doc_id, text): qk = stop_tokens*1e6 // n_tok
        (0, "the and of"),          # nt=3 ns=3 qk=1000000
        (1, "the cat sat on mat"),  # nt=5 ns=1 qk=200000
        (2, "x y z w"),             # nt=4 ns=0 qk=0
        (3, "the the"),             # nt=2 ns=2 qk=1000000
        (4, "q r"),                 # nt=2 ns=0 qk=0
    ]
    ds = _docs_ds(rows)
    # priority: qk desc, doc_id asc -> 0 (3), 3 (2), 1 (5), 2 (4), 4 (2)
    # cum:                             3      5      10     14     16
    got = (
        budget_fill(ds, budget_tokens=10, sub_docs=2, num_parts=4)
        .to_pandas()
        .sort_values("cum_tokens")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [0, 3, 1]
    assert got["cum_tokens"].tolist() == [3, 5, 10]
    assert got["quality_key"].tolist() == [1000000, 1000000, 200000]
    # budget 13: doc 2 (cum 14) is over; doc 4 would fit alone (cum 16 via
    # prefix => dropped too) — prefix semantics, not knapsack
    got13 = budget_fill(ds, budget_tokens=13, sub_docs=2, num_parts=4).to_pandas()
    assert sorted(got13["doc_id"].tolist()) == [0, 1, 3]


def test_vocab_growth_hand_case():
    """Docs 0-5, bucket width 2: doc0 brings {a,b}, doc1 {c}, doc3 {d},
    doc5 {e}; repeats never count. Buckets: 0 -> 3 new, 1 -> 1, 2 -> 1;
    cumulative 3, 4, 5."""
    from sbustreamspot_core_ray.stages.text import vocab_growth

    rows = [
        (0, "a b a"),
        (1, "c a"),
        (2, "b c"),
        (3, "d"),
        (4, "a d"),
        (5, "e b"),
    ]
    got = vocab_growth(_docs_ds(rows), bucket_width=2).to_pandas()
    assert got["bucket"].tolist() == [0, 1, 2]
    assert got["new_terms"].tolist() == [3, 1, 1]
    assert got["cum_vocab"].tolist() == [3, 4, 5]


def test_leakage_free_split_invariants():
    """Every dup_group must map to exactly one split, near-identical docs
    must share a group (hence a split), and the bucket arithmetic must
    match a direct big-int recomputation."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from sbustreamspot_core_ray.stages.curation import (
        SPLIT_SALT,
        leakage_free_split,
    )

    base = "the quick brown fox jumps over the lazy dog " * 6
    texts = []
    for i in range(24):
        if i % 3 == 0:
            texts.append(base + f"tail {i % 2}")   # near-dup pairs
        else:
            texts.append(f"unique document number {i} " * 8)
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    got = leakage_free_split(docs, num_parts=4).to_pandas()
    assert len(got) == len(texts)
    per_group = got.groupby("dup_group")["split"].nunique()
    assert (per_group == 1).all()
    # the near-dup family shares one group, so one split
    fam = got[got["doc_id"] % 3 == 0]
    assert fam["dup_group"].nunique() <= 2  # tail 0 vs tail 1 variants
    assert fam.groupby("dup_group")["split"].nunique().eq(1).all()
    for g, s in zip(got["dup_group"], got["split"]):
        b = ((int(g) * SPLIT_SALT) % (1 << 64)) % 100
        want = 0 if b < 80 else (1 if b < 90 else 2)
        assert s == want


def test_intradoc_dedup_hand_case():
    """Segment split, first-occurrence keep, tail-segment word counts."""
    from sbustreamspot_core_ray.stages.curation import intradoc_dedup

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["a b a b c", "x y x y", "z"], pa.string()),
            }
        )
    )
    out = (
        intradoc_dedup(docs, window=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_segs"].tolist() == [3, 2, 1]
    assert out["n_dup_segs"].tolist() == [1, 1, 0]
    assert out["n_kept_words"].tolist() == [3, 2, 1]


def test_char_entropy_hand_case():
    """H('aab') = ln3 - (2*ln2)/3 decomposition; uniform and constant."""
    import math

    from sbustreamspot_core_ray.stages.text import char_entropy

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["aab", "zzzz", "abcd"], pa.string()),
            }
        )
    )
    out = char_entropy(docs).to_pandas().sort_values("doc_id")
    assert out["n_chars"].tolist() == [3, 4, 4]
    assert out["n_distinct"].tolist() == [2, 1, 4]
    e1 = math.log(3) - (2 * math.floor(1e9 * math.log(2))) / (1e9 * 3)
    assert out["entropy"].tolist() == [round(e1, 6), 0.0, round(math.log(4), 6)]


def test_winnow_fingerprints_guarantee_and_reference():
    """Winnowing vs a brute-force reference, plus the MOSS guarantee:
    two docs sharing a >= k+w-1 byte substring share a selected fp."""
    from sbustreamspot_core_ray.stages.text import (
        WINNOW_K,
        WINNOW_W,
        _winnow_pows,
        winnow_fingerprints,
    )

    MERS = (1 << 61) - 1
    pows = _winnow_pows(WINNOW_K)

    def ref(doc_id, s):
        b = s.encode()
        gd = len(b) - WINNOW_K + 1
        if gd < WINNOW_W:
            return set()
        hs = []
        for p in range(gd):
            h = 0
            for j in range(WINNOW_K):
                h = (h + b[p + j] * pows[j]) % MERS
            hs.append(((h % (1 << 52)) << 10) + p)
        out = set()
        for st in range(gd - WINNOW_W + 1):
            out.add(min(hs[st : st + WINNOW_W]))
        return {(doc_id, m % 1024, m >> 10) for m in out}

    shared = "the common stolen passage here"
    texts = {
        1: "alpha " + shared + " tail one",
        2: "totally different prefix " + shared,
        3: "no overlap with anything else at all",
        4: "tiny",
    }
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
            }
        )
    )
    got = {
        (int(r["doc_id"]), int(r["pos"]), int(r["fp"]))
        for _, r in winnow_fingerprints(docs).to_pandas().iterrows()
    }
    expect = set()
    for d, s in texts.items():
        expect |= ref(d, s)
    assert got == expect
    fp1 = {f for (d, p, f) in got if d == 1}
    fp2 = {f for (d, p, f) in got if d == 2}
    fp3 = {f for (d, p, f) in got if d == 3}
    assert fp1 & fp2  # the MOSS guarantee on the shared passage
    assert not (fp1 & fp3)
    assert not any(d == 4 for (d, p, f) in got)  # shorter than k+w-1


def test_dup_span_coverage_vs_bruteforce():
    """Interval-union coverage vs the O(n^2) definition: overlapping and
    adjacent duplicated grams, within-doc-only repeats (must NOT count),
    short docs, and empty text."""
    from sbustreamspot_core_ray.stages.curation import dup_span_coverage

    texts = {
        1: "a b c d e f g h",          # shares 'a b c d e' run with 2
        2: "x a b c d e f y z",        # overlapping dup grams
        3: "p q r s t",                # unique text, no dups
        4: "m m m m m m m m m m",      # within-doc repeats only vs itself
        5: "m m m m m m m m m m",      # exact dup of 4 -> fully covered
        6: "one two",                  # shorter than n: no grams
        7: "",                         # empty
    }
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
            }
        )
    )
    got = (
        dup_span_coverage(docs, n=5, num_parts=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # brute force
    n = 5
    grams = {}
    for d, t in texts.items():
        ws = t.split()
        for i in range(len(ws) - n + 1):
            grams.setdefault(" ".join(ws[i : i + n]), set()).add(d)
    want = []
    for d, t in sorted(texts.items()):
        ws = t.split()
        covered = set()
        for i in range(len(ws) - n + 1):
            g = " ".join(ws[i : i + n])
            if len(grams[g]) >= 2:
                covered.update(range(i, i + n))
        want.append((d, len(ws), len(covered)))
    assert got[["doc_id", "n_tokens", "covered_tokens"]].to_numpy().tolist() \
        == [list(r) for r in want]
    by_id = {r[0]: r for r in want}
    assert by_id[4][2] == 10 and by_id[5][2] == 10  # cross-doc dup counts
    assert by_id[3][2] == 0                          # unique text untouched
    assert by_id[2][2] == 6                          # partial overlap-union


def test_dedup_stack_attribution_hand_case():
    """Stage attribution on a corpus with every removal class: exact
    clones, a near-dup pair (high Jaccard, not identical), a truncated
    prefix, and unique docs. First-stage-wins attribution must decompose
    the input exactly."""
    from sbustreamspot_core_ray.stages.curation import dedup_stack

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep dark forest tonight")
    near = base.replace("tonight", "today")  # one-token edit: Jaccard ~0.9
    texts = {
        1: base,
        2: base,                      # exact clone -> removed_exact
        3: near,                      # near-dup of 1 -> removed_near_dup
        4: base[: len(base) // 2],    # proper prefix of 1 -> removed_prefix
        5: "completely unrelated text about distributed dataflow engines "
           "processing parquet blocks with vectorized kernels every day",
        6: "another unique document mentioning graphs sketches and "
           "streaming anomaly detection pipelines at petabyte scale",
    }
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
            }
        )
    )
    res = dedup_stack(docs, threshold=0.4, num_parts=4, minhash_parts=2)
    got = dict(zip(res["stage"].to_pylist(), res["n"].to_pylist()))
    assert got["input"] == 6
    assert got["removed_exact"] == 1          # doc 2
    assert got["removed_near_dup"] >= 1       # doc 3 (maybe 4 too if shingled in)
    assert got["removed_prefix"] + got["removed_near_dup"] == 2  # docs 3 and 4
    assert got["kept"] == 3                   # docs 1, 5, 6
    assert sum(v for k, v in got.items() if k != "input") == got["input"]


def test_importance_weights_prefers_target_domain_tokens():
    """DSIR sanity: docs made of target-domain-only tokens score positive,
    off-domain-only tokens negative; weights are exact integers matching
    the closed-form add-1 log-ratio."""
    import math

    from sbustreamspot_core_ray.stages.curation import importance_weights

    rows = [
        (1, "en", "alpha alpha beta"),
        (2, "en", "alpha beta beta"),
        (3, "de", "gamma gamma delta"),
        (4, "de", "gamma delta delta"),
    ]
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "lang": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )
    out = (
        importance_weights(docs, target_lang="en", top_v=10)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # closed form: T_all=12, T_tgt=6, vocab={alpha,beta,gamma,delta} V=4
    cnt_all = {"alpha": 3, "beta": 3, "gamma": 3, "delta": 3}
    cnt_tgt = {"alpha": 3, "beta": 3, "gamma": 0, "delta": 0}

    def q(t):
        qt = math.floor(math.log((cnt_tgt[t] + 1) / (6 + 4)) * 1e9 + 0.5)
        qr = math.floor(math.log((cnt_all[t] + 1) / (12 + 4)) * 1e9 + 0.5)
        return qt - qr

    expect = {
        1: 2 * q("alpha") + q("beta"),
        2: q("alpha") + 2 * q("beta"),
        3: 2 * q("gamma") + q("delta"),
        4: q("gamma") + 2 * q("delta"),
    }
    for did, w in expect.items():
        assert out.loc[did, "weight_e9"] == w
        assert out.loc[did, "n_tokens"] == 3
    assert out.loc[1, "weight_e9"] > 0 > out.loc[3, "weight_e9"]


def test_kneser_ney_closed_form_tiny_corpus():
    """KN bigram on a 2-doc corpus: q values recomputed by hand with the
    identical IEEE chain; per-doc sums must match exactly. Also checks
    the continuation-probability effect: a word seen after many distinct
    left-contexts gets more backoff mass than an equally-frequent word
    glued to one context."""
    import math

    from sbustreamspot_core_ray.stages.text import kneser_ney_logprob

    rows = [
        (1, "a b a b c b"),
        (2, "x b y b a c"),
    ]
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    out = (
        kneser_ney_logprob(docs).to_pandas().set_index("doc_id").sort_index()
    )

    # corpus bigrams per doc (adjacent pairs)
    def bigrams(s):
        t = s.split()
        return list(zip(t[:-1], t[1:]))

    from collections import Counter

    cnt = Counter()
    for _, s in rows:
        cnt.update(bigrams(s))
    ca = Counter()
    n1f = Counter()
    n1r = Counter()
    for (a, b), c in cnt.items():
        ca[a] += c
        n1f[a] += 1
        n1r[b] += 1
    n1t = len(cnt)

    def q(a, b):
        t1 = max(float(cnt[(a, b)]) - 0.75, 0.0) / float(ca[a])
        t2 = (0.75 * float(n1f[a])) / float(ca[a])
        t3 = float(n1r[b]) / float(n1t)
        return math.floor(math.log(t1 + t2 * t3) * 1e9 + 0.5)

    for did, s in rows:
        bgs = bigrams(s)
        assert out.loc[did, "n_bigrams"] == len(bgs)
        assert out.loc[did, "kn_logprob_e9"] == sum(q(a, b) for a, b in bgs)


def test_weighted_sample_vs_bruteforce_and_weight_bias():
    """A-ES weighted reservoir: selection must equal the brute-force
    smallest-(-ln(u)/w) set (deterministic hash u), and long documents
    must be overrepresented relative to a uniform sample."""
    import math

    from sbustreamspot_core_ray.stages.curation import FIB_MIX, weighted_sample

    rng = np.random.default_rng(3)
    texts = {}
    for i in range(400):
        L = 5 + int(rng.integers(0, 20)) if i % 2 else 200 + int(rng.integers(0, 200))
        texts[i] = "x" * L
    texts[400] = ""          # zero weight -> excluded
    texts[401] = None        # null -> excluded
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
            }
        )
    )
    n = 50
    got = weighted_sample(docs, n).to_pandas()

    def key(i):
        h = (i * int(FIB_MIX)) % (1 << 64)
        u = ((h >> 11) + 1.0) / float(1 << 53)
        return math.floor(-math.log(u) / len(texts[i]) * 1e9 + 0.5)

    ref = sorted(
        (key(i), i) for i in texts if texts[i]
    )[:n]
    assert list(got["doc_id"]) == [i for _, i in ref]
    assert list(got["key_e9"]) == [k for k, _ in ref]
    assert 400 not in set(got["doc_id"]) and 401 not in set(got["doc_id"])
    # weight bias: even ids are ~20x heavier -> they should dominate the
    # sample far beyond their 50% population share
    frac_heavy = (got["doc_id"] % 2 == 0).mean()
    assert frac_heavy > 0.75
