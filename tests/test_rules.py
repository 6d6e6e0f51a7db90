import numpy as np
import pandas as pd

from rayquality.rules import heuristics, validity
from rayquality import scrub


def test_char_stats_naive_parity():
    texts = ["abc def!", "", "a#b$c%", "12345", "hello world this is fine"]
    st = heuristics.char_stats(texts)
    for i, t in enumerate(texts):
        b = t.encode()
        assert st["n_chars"][i] == len(b)
        punct = sum(1 for ch in b if chr(ch) in "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")
        digits = sum(1 for ch in b if chr(ch).isdigit())
        assert abs(st["symbol_ratio"][i] - punct / max(len(b), 1)) < 1e-12
        assert abs(st["digit_ratio"][i] - digits / max(len(b), 1)) < 1e-12


def test_word_stats_counts_and_stopwords():
    texts = ["the cat sat on the mat", "widget sprocket flange", ""]
    st = heuristics.word_stats(texts)
    assert list(st["n_words"]) == [6, 3, 0]
    assert st["stopword_frac"][0] == 3 / 6  # the, on, the
    assert st["stopword_frac"][1] == 0.0


def test_word_stats_repetition():
    phrase = "red dog runs"
    rep = " ".join([phrase] * 5)  # 15 words -> 13 trigrams, only 3 distinct
    st = heuristics.word_stats([rep, "all words here are fully distinct tokens"])
    assert st["rep3_frac"][0] > 0.7
    assert st["rep3_frac"][1] == 0.0


# --- reference golden values (tests/unit/validators/test_patterns.py:21-142) ---

def test_cnpj_reference_golden():
    valid = pd.Series(["11.444.777/0001-61", "11444777000161", "11.222.333/0001-81"])
    assert validity.cnpj_valid_mask(valid).all()
    invalid = pd.Series(["11.444.777/0001-62", "1144477700016", "00.000.000/0000-00", "abc"])
    assert not validity.cnpj_valid_mask(invalid, allow_nulls=False).any()


def test_cpf_reference_golden():
    valid = pd.Series(["123.456.789-09", "12345678909", "987.654.321-00"])
    assert validity.cpf_valid_mask(valid).all()
    invalid = pd.Series(["123.456.789-10", "1234567890", "111.111.111-11", "000.000.000-00"])
    assert not validity.cpf_valid_mask(invalid, allow_nulls=False).any()


def test_regex_null_semantics():
    s = pd.Series(["a@b.com", None, "", "not-an-email"])
    m = validity.regex_valid_mask(s, validity.BUILTIN_PATTERNS["email"], allow_nulls=True)
    assert list(m) == [True, True, True, False]
    m2 = validity.regex_valid_mask(s, validity.BUILTIN_PATTERNS["email"], allow_nulls=False)
    assert list(m2) == [True, False, False, False]


def test_phone_patterns():
    s = pd.Series(["(11) 91234-5678", "1234-5678", "12345678", "garbage"])
    m = validity.regex_valid_mask(s, validity.BUILTIN_PATTERNS["phone_br"], allow_nulls=False)
    assert list(m) == [True, True, True, False]


def test_detect_pattern_type():
    assert validity.detect_pattern_type("customer_cnpj") == "cnpj"
    assert validity.detect_pattern_type("EMAIL_ADDR") == "email"
    assert validity.detect_pattern_type("telefone_1") == "phone"
    assert validity.detect_pattern_type("plain_col") is None


# --- scrub ---

def test_scrub_golden_cases():
    cases = {
        "mail me at bob.smith+x@mail.example.org now": "mail me at <EMAIL> now",
        "ssn 123-45-6789 ok": "ssn <SSN> ok",
        "call (11) 91234-5678 or 1234-5678": "call <PHONE> or <PHONE>",
        "what a Grumblefut day": "what a <CENSORED> day",
        "clean caption stays": "clean caption stays",
    }
    for src, want in cases.items():
        got, hits = scrub.scrub_text(src)
        assert got == want, (src, got)
        assert (hits > 0) == (src != want)
    assert scrub.scrub_text(None) == (None, 0)


def test_scrub_series_matches_scalar():
    texts = pd.Series(
        ["a@b.co and c@d.io", None, "123-45-6789", "fine", "snarkblat!", "(21) 1234-5678"]
    )
    out, hits = scrub.scrub_series(texts)
    for i, t in enumerate(texts):
        want, wh = scrub.scrub_text(t if pd.notna(t) else None)
        got = out.iloc[i]
        assert (got if pd.notna(got) else None) == want
        assert hits[i] == wh
