"""Language identification (operators/langid.py): char n-gram
multinomial NB over planted seed fixtures.  The decision pins here
(every LANG_HELDOUT sentence correct with margin >= 14) are what make
the d01 'lid' gate's analytic oracle sound — if a fixture edit or
model change ever flips a held-out label, THIS file fails before the
driver gate does."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_governance_spark.operators.langid import (
    LANG_HELDOUT,
    LANG_SEEDS,
    LangIdModel,
    classify,
    detect_language,
    fit_langid,
    langid_confusion,
    train_langid,
)


@pytest.fixture(scope="module")
def model():
    return train_langid()


class TestModel:
    def test_heldout_all_correct_with_margin(self, model):
        """The gate-soundness pin: 24/24 held-out sentences, margin
        >= 14 log-prob units over the runner-up."""
        for lang, sents in LANG_HELDOUT.items():
            for t in sents:
                pred, margin = classify(model, t)
                assert pred == lang, f"{t!r}: {pred} != {lang}"
                assert margin >= 14.0, f"{t!r}: margin {margin:.1f}"

    def test_close_pair_pt_es_separates(self, model):
        for t in LANG_HELDOUT["pt"]:
            assert classify(model, t)[0] == "pt"
        for t in LANG_HELDOUT["es"]:
            assert classify(model, t)[0] == "es"

    def test_training_data_classified(self, model):
        for lang, sents in LANG_SEEDS.items():
            for t in sents:
                assert classify(model, t)[0] == lang

    def test_deterministic(self, model):
        m2 = train_langid()
        assert m2.langs == model.langs
        assert m2.gram_index == model.gram_index
        assert np.array_equal(m2.logprob, model.logprob)

    def test_und_on_letterless(self, model):
        for t in (None, "", "   ", "12345", "!!! ??? 42 --- 7"):
            assert classify(model, t) == ("und", 0.0)

    def test_long_text_capped(self, model):
        # a 10 MB pathological row costs max_chars of work, not 10 MB
        t = LANG_HELDOUT["fr"][0] * 200_000
        assert classify(model, t)[0] == "fr"

    def test_validation(self):
        with pytest.raises(ValueError, match="alpha"):
            train_langid(alpha=0.0)
        with pytest.raises(ValueError, match="orders"):
            train_langid(orders=())
        with pytest.raises(ValueError, match=">= 2 languages"):
            train_langid({"en": ("hello there",)})
        with pytest.raises(ValueError, match="no grams"):
            train_langid({"en": (), "de": ()})
        with pytest.raises(ValueError, match="shape"):
            LangIdModel(
                langs=("de", "en"),
                gram_index={"a": 0},
                logprob=np.zeros((5, 2), dtype=np.float32),
                orders=(1,),
                max_chars=400,
            )

    @settings(max_examples=150, deadline=None)
    @given(st.text(max_size=600))
    def test_arbitrary_text_never_raises(self, model, t):
        pred, margin = classify(model, t)
        assert pred == "und" or pred in model.langs
        assert np.isfinite(margin) and margin >= 0.0


class TestSpark:
    def test_detect_language_end_to_end(self, spark, model):
        rows = [
            (i, lang, t)
            for i, (lang, t) in enumerate(
                (lang, t)
                for lang in sorted(LANG_HELDOUT)
                for t in LANG_HELDOUT[lang]
            )
        ]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        got = (
            detect_language(df, model, margin_col="m")
            .select("lang", "lang_pred", "m")
            .collect()
        )
        assert all(r["lang_pred"] == r["lang"] for r in got)
        assert all(r["m"] >= 14.0 for r in got)

    def test_detect_language_matches_driver_classify(self, spark, model):
        texts = [t for ss in LANG_HELDOUT.values() for t in ss] + [
            None, "", "999", "mixed English y español no mesmo texto",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["lang_pred"], r["m"])
            for r in detect_language(df, model, margin_col="m").collect()
        }
        for i, t in enumerate(texts):
            lang, margin = classify(model, t)
            assert got[i][0] == lang
            assert got[i][1] == pytest.approx(margin, rel=1e-9)

    def test_fit_langid_matches_driver_train(self, spark, model):
        rows = [
            (lang, t)
            for lang in sorted(LANG_SEEDS)
            for t in LANG_SEEDS[lang]
        ]
        df = spark.createDataFrame(rows, "lang string, text string")
        fitted = fit_langid(df)
        assert fitted.langs == model.langs
        assert fitted.gram_index == model.gram_index
        assert np.array_equal(fitted.logprob, model.logprob)

    def test_fit_langid_vocab_cap_bounds_model(self, spark):
        rows = [
            (lang, t)
            for lang in sorted(LANG_SEEDS)
            for t in LANG_SEEDS[lang]
        ]
        df = spark.createDataFrame(rows, "lang string, text string")
        small = fit_langid(df, vocab_cap=50)
        assert len(small.gram_index) <= 50 * len(LANG_SEEDS)
        # a capped model still separates an easy pair
        assert classify(small, LANG_HELDOUT["ru"][0])[0] == "ru"
        with pytest.raises(ValueError, match="vocab_cap"):
            fit_langid(df, vocab_cap=0)

    def test_confusion_diagonal(self, spark, model):
        rows = [
            (lang, t)
            for lang in sorted(LANG_HELDOUT)
            for t in LANG_HELDOUT[lang]
        ]
        df = spark.createDataFrame(rows, "lang string, text string")
        cm = {
            (r["lang"], r["predicted"]): r["n"]
            for r in langid_confusion(df, model).collect()
        }
        assert cm == {(lg, lg): len(LANG_HELDOUT[lg]) for lg in LANG_HELDOUT}
