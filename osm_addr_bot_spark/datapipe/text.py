"""Text analysis: language-ID, quality scoring, token counting,
fingerprinting. All native expressions (regex + arithmetic), oracle-
reproducible in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_addr_bot_spark.datapipe.dedup import md5_int, normalize_text

# tiny stopword profiles; scored by per-language hit counts over tokens
LANG_PROFILES = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une"),
    "pl": ("i", "w", "nie", "na", "to", "się", "jest", "z"),
}


def _tokens(text: Column) -> Column:
    return F.split(normalize_text(text), " ")


def lang_scores(text: Column) -> dict[str, Column]:
    toks = _tokens(text)
    out = {}
    for lang, words in LANG_PROFILES.items():
        wl = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))
    return out


def lang_id(docs: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """(doc_id, lang_pred, lang_hits): argmax stopword-profile hits,
    deterministic tie-break by profile order, 'und' when all zero."""
    scores = lang_scores(F.col(text_col))
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in reversed(list(LANG_PROFILES)):  # earlier profiles win ties
        s = scores[lang]
        best_lang = F.when(s >= best_score, F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(s, best_score)
    hits = None
    for lang in LANG_PROFILES:
        hits = scores[lang] if hits is None else hits + scores[lang]
    return docs.select(
        F.col(key).alias("doc_id"),
        F.when(hits > 0, best_lang).otherwise(F.lit("und")).alias("lang_pred"),
        hits.alias("lang_hits"),
    )


def quality_features(docs: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """(doc_id, n_chars, n_tokens, mean_token_len, punct_ratio,
    stopword_ratio, quality): simple composable quality heuristics."""
    text = F.col(text_col)
    toks = _tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    mean_tok = (F.length(normalize_text(text)) - (n_tokens - 1)) / n_tokens
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    en = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(en, t))) / F.greatest(
        n_tokens, F.lit(1)
    )
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    # integer 0-100 score — integer arithmetic end-to-end so any engine
    # reproduces it bit-for-bit (no float rounding at tier boundaries)
    quality = (
        F.when(n_tokens >= 20, 40).otherwise(n_tokens * 2)
        + F.when((mean_tok >= 3) & (mean_tok <= 9), 30).otherwise(0)
        + F.when(punct_ratio < 0.2, 20).otherwise(0)
        + F.least(F.floor(n_stop * 200 / F.greatest(n_tokens, F.lit(1))), F.lit(10).cast("long"))
    )
    return docs.select(
        F.col(key).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_tok, 4).alias("mean_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        quality.cast("long").alias("quality"),
    )


def token_counts(docs: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens): whitespace count + a BPE-ish
    proxy (word pieces of <=4 chars: ceil(len/4) per word, punct as
    single tokens)."""
    text = F.col(text_col)
    words = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    ws = F.size(words)
    pieces = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(F.regexp_replace(w, r"[^\w]", "")) / 4.0).cast("long")
        + F.length(F.regexp_replace(w, r"[\w]", "")).cast("long"),
    )
    return docs.select(F.col(key).alias("doc_id"), ws.alias("ws_tokens"), pieces.alias("bpe_ish_tokens"))


def fingerprints(docs: DataFrame, text_col: str = "text", key: str = "doc_id", window: int = 64) -> DataFrame:
    """(doc_id, fingerprint, head_fingerprint): whole-doc content hash +
    head-window hash (cheap near-head-dup probe)."""
    norm = normalize_text(F.col(text_col))
    return docs.select(
        F.col(key).alias("doc_id"),
        md5_int(norm).alias("fingerprint"),
        md5_int(F.substring(norm, 1, window)).alias("head_fingerprint"),
    )
