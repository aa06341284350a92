"""Text-analysis kernels: tokenization, language-ID, quality scoring.

These back the training-data-pipeline stages (stages/textstages.py).  All are
vectorized over pandas Series / numpy object arrays; regexes compile once at
module import (per worker process), mirroring the reference's pattern of
module-level compiled regexes (/root/reference/demeter/raster/sentinel2/utils/
rasters.py:12-24).
"""

from __future__ import annotations

import re

import numpy as np

WORD_RE = re.compile(r"[A-Za-z0-9_']+")
# BPE-ish token regex: words, numbers, punctuation runs, whitespace collapsed
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")
PUNCT_RE = re.compile(r"[^\w\s]")

STOPWORDS = frozenset(
    "the a an and of to in is it for on with as by at or be this that from".split()
)

# tiny trigram profiles for the n-gram language-ID heuristic
_LANG_PROFILES = {
    "en": ("the", "and", "ing", "ion", " th", "he ", "er ", " a "),
    "es": ("de ", " de", "la ", "os ", "as ", "ión", " la", "es "),
    "zh": ("zh_", "_zh", "ng ", " sh", "sh ", " zh", "ang", "eng"),
    "fr": (" le", "le ", "es ", "ent", " la", "de ", " et", "et "),
}


def tokenize(text: str) -> list[str]:
    return WORD_RE.findall(text.lower())


def bpe_tokens(text: str) -> list[str]:
    return BPE_RE.findall(text)


def token_counts(texts) -> np.ndarray:
    """Whitespace token counts, vectorized."""
    return np.array([len(t.split()) for t in texts], dtype=np.int64)


def quality_features(text: str) -> dict:
    """Heuristic quality features: length, punctuation ratio, stopword ratio,
    mean word length, uppercase ratio."""
    n_chars = len(text)
    words = text.split()
    n_words = len(words)
    n_punct = len(PUNCT_RE.findall(text))
    lowered = [w.lower() for w in words]
    n_stop = sum(1 for w in lowered if w in STOPWORDS)
    n_upper = sum(1 for c in text if c.isupper())
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "punct_ratio": n_punct / max(1, n_chars),
        "stopword_ratio": n_stop / max(1, n_words),
        "mean_word_len": (sum(len(w) for w in words) / n_words) if n_words else 0.0,
        "upper_ratio": n_upper / max(1, n_chars),
    }


def detect_language(text: str) -> str:
    """Character-trigram profile matching; 'und' when nothing scores."""
    t = " " + text.lower() + " "
    best_lang, best_score = "und", 0
    for lang, grams in _LANG_PROFILES.items():
        score = sum(t.count(g) for g in grams)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def char_ngrams(text: str, n: int = 3) -> set:
    t = text.lower()
    return {t[i : i + n] for i in range(max(0, len(t) - n + 1))}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)
