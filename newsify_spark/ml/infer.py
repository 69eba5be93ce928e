"""Deterministic inference stubs for the reference's model UDF surface
(SURVEY §2.9 U1-U4). The real models (SentenceTransformer, spaCy,
DistilBART, HF sentiment) are not in this image; each stub preserves the
exact Spark plumbing — Arrow-batched pandas UDF, same schema, same batch
shape — so swapping in a real model is a one-line change inside the UDF.

U1 embed:     hash-seeded pseudo-embedding, unit-normalized (384-d default)
U2 NER:       vocabulary-free token heuristic (long tokens as 'entities')
U3 summarize: leading-tokens extractive stub
U4 sentiment: tiny lexicon, signed score

U2-U4 are also expressible as pure SQL expressions — their oracle-checked
forms live in queries/mlops.py; the pandas-UDF forms here are the
swap-in-a-real-model path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBED_DIM = 384

POS_WORDS = {"fast", "small", "value"}
NEG_WORDS = {"slow", "big", "error"}


def _embed_one(text: str, dim: int) -> list[float]:
    # seed an rng from a stable content digest -> deterministic vector
    seed = int.from_bytes(hashlib.md5(text.encode()).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype("float32").tolist()


def embed_text_udf(dim: int = EMBED_DIM):
    """U1: text -> array<float> (reference duplication_service.py:59,64;
    all-MiniLM-L6-v2). Real model swap: call model.encode(batch) here."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(s: pd.Series) -> pd.Series:
        return s.fillna("").map(lambda t: _embed_one(t, dim))

    return _embed


@F.pandas_udf(T.ArrayType(T.StringType()))
def ner_entities_udf(s: pd.Series) -> pd.Series:
    """U2: text -> entity list (reference duplication_service.py:58,65;
    spaCy NER). Stub: distinct tokens longer than 5 chars, sorted."""
    return s.fillna("").map(
        lambda t: sorted({w for w in t.lower().split(" ") if len(w) > 5})
    )


@F.pandas_udf(T.StringType())
def summarize_udf(s: pd.Series) -> pd.Series:
    """U3: text -> summary (reference summarization-service.py:24-36;
    DistilBART). Stub: first 10 tokens."""
    return s.fillna("").map(lambda t: " ".join(t.split(" ")[:10]))


@F.pandas_udf(T.DoubleType())
def sentiment_udf(s: pd.Series) -> pd.Series:
    """U4: text -> signed score (reference bias_detection_service.py:61-62;
    HF sentiment pipeline). Stub: (pos-neg)/n_tokens lexicon ratio."""

    def score(t: str) -> float:
        toks = t.lower().split(" ")
        if not toks:
            return 0.0
        pos = sum(w in POS_WORDS for w in toks)
        neg = sum(w in NEG_WORDS for w in toks)
        return (pos - neg) / len(toks)

    return s.fillna("").map(score)
