import numpy as np

from rayquality.models import corpus, langid, perplexity, textfeat


def test_segment_scores_match_naive():
    texts = ["hello world", "", "ab", "the quick brown fox", None, "zz!! 99"]
    texts = [t if t is not None else "" for t in texts]
    lut = np.random.default_rng(0).normal(size=(2, textfeat.N_TRIGRAMS))
    scores, counts = textfeat.segment_scores(texts, lut)
    for i, t in enumerate(texts):
        cls = textfeat.CLASS_LUT[np.frombuffer(t.encode(), dtype=np.uint8)]
        exp_score = np.zeros(2)
        exp_n = 0
        for j in range(len(cls) - 2):
            code = int(cls[j]) * 1024 + int(cls[j + 1]) * 32 + int(cls[j + 2])
            exp_score += lut[:, code]
            exp_n += 1
        assert counts[i] == exp_n, (i, t)
        np.testing.assert_allclose(scores[i], exp_score, rtol=1e-12)


def test_langid_separates_languages():
    model = langid.get_model()
    per_lang = {lang: corpus.sentences(lang, 40, seed=777) for lang in corpus.LANGS}
    correct = total = 0
    for lang, sents in per_lang.items():
        pred, conf = model.predict(sents)
        correct += int((pred == lang).sum())
        total += len(sents)
        assert (conf >= 0).all() and (conf <= 1).all()
    assert correct / total >= 0.9, correct / total


def test_langid_empty_is_unknown():
    pred, conf = langid.get_model().predict(["", "ab"])
    assert pred[0] == langid.UNKNOWN and conf[0] == 0.0


def test_perplexity_orders_text_quality():
    model = perplexity.get_model()
    clean = corpus.sentences("en", 20, seed=5)
    rng = np.random.default_rng(6)
    chars = np.array(list("qxzjvkwqxzjvkw"))
    gib = ["".join(chars[rng.integers(0, len(chars), 50)]) for _ in range(20)]
    p_clean = model.perplexity(clean)
    p_gib = model.perplexity(gib)
    assert float(np.median(p_clean)) < float(np.median(p_gib)) / 3
    assert model.perplexity([""])[0] == perplexity.PPL_EMPTY


def test_models_deterministic_across_instances():
    a, b = langid.LangIdModel(), langid.LangIdModel()
    np.testing.assert_array_equal(a.luts, b.luts)
    pa_, pb_ = perplexity.PerplexityModel(), perplexity.PerplexityModel()
    np.testing.assert_array_equal(pa_.lut, pb_.lut)
