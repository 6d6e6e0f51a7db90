"""Pattern-validity kernels: anchored regexes + CPF/CNPJ checksum math.

Reference semantics (cited into /root/reference):
- regex family: null/empty counts valid iff ``allow_nulls`` (default True);
  non-null values are ``str(v).strip()`` then anchored-matched
  (``validators/patterns.py:203-232``); built-in email / phone_br / cep
  regexes at ``validators/patterns.py:30-56``.
- CNPJ: strip non-digits, len==14, reject all-same-digit, two weighted
  mod-11 check digits (``validators/patterns.py:298-330``).
- CPF: same shape, len==11, weights 10..2 / 11..2
  (``validators/patterns.py:332-364``).

The checksums are vectorized as digit-matrix dot products over the whole
batch (SURVEY.md §2.2 M3/M4) instead of the reference's per-value loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Reference built-ins (validators/patterns.py:30-56), anchored.
BUILTIN_PATTERNS = {
    "email": r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$",
    "phone_br": r"^(\(\d{2}\)\s?)?\d{4,5}-?\d{4}$",
    "cep": r"^\d{5}-?\d{3}$",
}


def regex_valid_mask(values: pd.Series, pattern: str, allow_nulls: bool = True) -> np.ndarray:
    """Boolean per-row validity under the reference's regex-rule semantics."""
    s = values.astype("object")
    isnull = s.isna().to_numpy()
    stripped = s.fillna("").astype(str).str.strip()
    empty = (stripped == "").to_numpy()
    matched = stripped.str.match(pattern, na=False).to_numpy()
    nullish = isnull | empty
    valid = np.where(nullish, allow_nulls, matched)
    return valid.astype(bool)


def _digits_matrix(values: pd.Series, width: int) -> tuple[np.ndarray, np.ndarray]:
    """Strip non-digits per value; return (n, width) digit matrix + ok-length mask."""
    cleaned = values.fillna("").astype(str).str.replace(r"[^\d]", "", regex=True)
    ok = (cleaned.str.len() == width).to_numpy()
    mat = np.zeros((len(values), width), dtype=np.int64)
    if ok.any():
        arr = cleaned[ok].to_numpy()
        # fixed-width digit strings -> byte view -> digit matrix (vectorized)
        blob = "".join(arr).encode("ascii")
        mat[ok] = (np.frombuffer(blob, dtype=np.uint8).reshape(-1, width) - ord("0")).astype(
            np.int64
        )
    return mat, ok


def _mod11_digit(weighted_sum: np.ndarray) -> np.ndarray:
    rem = weighted_sum % 11
    return np.where(rem < 2, 0, 11 - rem)


def cnpj_valid_mask(values: pd.Series, allow_nulls: bool = True) -> np.ndarray:
    """Vectorized CNPJ checksum (validators/patterns.py:298-330)."""
    nullish = _nullish(values)
    mat, ok = _digits_matrix(values, 14)
    all_same = (mat == mat[:, :1]).all(axis=1)
    w1 = np.array([5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2])
    w2 = np.array([6, 5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2])
    d13 = _mod11_digit(mat[:, :12] @ w1)
    d14 = _mod11_digit(mat[:, :13] @ w2)
    checks = (mat[:, 12] == d13) & (mat[:, 13] == d14)
    valid = ok & ~all_same & checks
    return np.where(nullish, allow_nulls, valid).astype(bool)


def cpf_valid_mask(values: pd.Series, allow_nulls: bool = True) -> np.ndarray:
    """Vectorized CPF checksum (validators/patterns.py:332-364)."""
    nullish = _nullish(values)
    mat, ok = _digits_matrix(values, 11)
    all_same = (mat == mat[:, :1]).all(axis=1)
    w1 = np.arange(10, 1, -1)  # 10..2
    w2 = np.arange(11, 1, -1)  # 11..2
    d10 = _mod11_digit(mat[:, :9] @ w1)
    d11 = _mod11_digit(mat[:, :10] @ w2)
    checks = (mat[:, 9] == d10) & (mat[:, 10] == d11)
    valid = ok & ~all_same & checks
    return np.where(nullish, allow_nulls, valid).astype(bool)


def _nullish(values: pd.Series) -> np.ndarray:
    s = values.astype("object")
    return (s.isna() | (s.fillna("").astype(str).str.strip() == "")).to_numpy()


VALIDATORS = {
    "email": lambda s, allow_nulls=True: regex_valid_mask(s, BUILTIN_PATTERNS["email"], allow_nulls),
    "phone": lambda s, allow_nulls=True: regex_valid_mask(s, BUILTIN_PATTERNS["phone_br"], allow_nulls),
    "cep": lambda s, allow_nulls=True: regex_valid_mask(s, BUILTIN_PATTERNS["cep"], allow_nulls),
    "cnpj": cnpj_valid_mask,
    "cpf": cpf_valid_mask,
}


def detect_pattern_type(column_name: str) -> str | None:
    """Column-name sniffing (validators/patterns.py:277-296)."""
    name = column_name.lower()
    if "cnpj" in name:
        return "cnpj"
    if "cpf" in name:
        return "cpf"
    if "email" in name or "mail" in name:
        return "email"
    if "phone" in name or "telefone" in name or "fone" in name:
        return "phone"
    if "cep" in name:
        return "cep"
    return None
