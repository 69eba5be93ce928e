"""Pluggable model slots for the U1-U4 inference surface (VERDICT
round-1 "What's missing" #2).

The reference runs real models in its services — SentenceTransformer
embeddings (duplication_service.py:59-66), spaCy NER, DistilBART
summarization (summarization-service.py:24-36), HF sentiment
(bias_detection_service.py:61-62). Those libraries are not in this
image, so the DEFAULT implementation of every slot is the deterministic
stub from ml/infer.py — but the production wiring is real and tested:

- each slot is a named registry entry holding one or more
  implementations ("stub" default, "real", test fakes);
- the UDF uses the ITERATOR-of-Series pandas UDF form, so the model
  loads ONCE per executor python worker per partition (the
  predict_batch_udf pattern from pyspark.ml.functions), not per batch;
- ``batch_size`` re-chunks Arrow batches before predict — real models
  care about GPU batch geometry, Arrow's default 10k rows is usually
  wrong for them;
- small model states can be SHIPPED VIA BROADCAST (``state`` +
  ``make_predict_fn(state)``): the driver serializes once, every
  executor deserializes once, instead of re-loading from disk per task.

Swapping in a real model is one ``register_impl`` call:

    register_impl("embed", "minilm", ModelImpl(
        make_predict_fn=lambda _:
            SentenceTransformer("all-MiniLM-L6-v2").encode_series,
        return_type="array<float>", batch_size=64))
    df.select(model_udf(spark, "embed", impl="minilm")("text"))
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass
from typing import Any

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@dataclass
class ModelImpl:
    """One implementation of a model slot.

    ``make_predict_fn(state)`` runs ON THE EXECUTOR, once per python
    worker per partition; it returns ``predict(batch: pd.Series) ->
    pd.Series``. ``state`` is an optional picklable payload (weights,
    lexicon, dim) shipped via Spark broadcast when ``broadcast=True`` —
    otherwise it rides the task closure.
    """

    make_predict_fn: Callable[[Any], Callable[[pd.Series], pd.Series]]
    return_type: str
    state: Any = None
    batch_size: int = 0  # 0 = keep Arrow's native batch size
    broadcast: bool = False


# slot -> impl name -> ModelImpl
_REGISTRY: dict[str, dict[str, ModelImpl]] = {}
DEFAULT_IMPL = "stub"


def register_impl(slot: str, name: str, impl: ModelImpl) -> None:
    _REGISTRY.setdefault(slot, {})[name] = impl


def get_impl(slot: str, name: str) -> ModelImpl:
    try:
        return _REGISTRY[slot][name]
    except KeyError:
        known = {s: sorted(i) for s, i in _REGISTRY.items()}
        raise KeyError(f"no model impl {slot!r}/{name!r}; registered: {known}") from None


# one broadcast per (slot, impl) per SparkContext — model_udf may be
# rebuilt per request/micro-batch, and each sc.broadcast otherwise
# accumulates on driver and executors for the application's lifetime
_BCAST_CACHE: dict[tuple[int, str, str], object] = {}


def _state_broadcast(spark: SparkSession, slot: str, impl: str, state):
    sc = spark.sparkContext
    key = (id(sc), slot, impl)
    b = _BCAST_CACHE.get(key)
    if b is None:
        b = sc.broadcast(state)
        _BCAST_CACHE[key] = b
    return b


def model_udf(spark: SparkSession, slot: str, impl: str | None = None):
    """Build the inference UDF for ``slot``. ``impl`` defaults to the
    ``newsify.model.<slot>`` Spark conf if set, else "stub"."""
    if impl is None:
        impl = spark.conf.get(f"newsify.model.{slot}", DEFAULT_IMPL)
    m = get_impl(slot, impl)

    state_ref = (
        _state_broadcast(spark, slot, impl, m.state) if m.broadcast else None
    )
    plain_state = None if m.broadcast else m.state
    make_fn, batch_size = m.make_predict_fn, m.batch_size

    @F.pandas_udf(m.return_type)
    def _udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        state = state_ref.value if state_ref is not None else plain_state
        predict = make_fn(state)  # once per worker per partition
        for s in it:
            if batch_size and len(s) > batch_size:
                outs = [
                    predict(s.iloc[i : i + batch_size])
                    for i in range(0, len(s), batch_size)
                ]
                yield pd.concat(outs, ignore_index=True)
            else:
                yield predict(s)

    return _udf


# ---------------------------------------------------------------------------
# Default stub implementations — same deterministic functions the
# oracle-checked queries pin (ml/infer.py), wrapped as registry entries.
# ---------------------------------------------------------------------------


def _embed_predict(state):
    from newsify_spark.ml.infer import _embed_one

    dim = state["dim"]
    return lambda s: s.fillna("").map(lambda t: _embed_one(t, dim))


def _ner_predict(_state):
    return lambda s: s.fillna("").map(
        lambda t: sorted({w for w in t.lower().split(" ") if len(w) > 5})
    )


def _summ_predict(_state):
    return lambda s: s.fillna("").map(lambda t: " ".join(t.split(" ")[:10]))


def _sent_predict(state):
    pos, neg = state["pos"], state["neg"]

    def score(t: str) -> float:
        toks = t.lower().split(" ")
        if not toks:
            return 0.0
        return (sum(w in pos for w in toks) - sum(w in neg for w in toks)) / len(toks)

    return lambda s: s.fillna("").map(score)


def register_default_stubs(embed_dim: int = 384) -> None:
    from newsify_spark.ml.infer import NEG_WORDS, POS_WORDS

    register_impl(
        "embed",
        "stub",
        ModelImpl(_embed_predict, "array<double>", state={"dim": embed_dim}, broadcast=True),
    )
    register_impl("ner", "stub", ModelImpl(_ner_predict, "array<string>"))
    register_impl("summarize", "stub", ModelImpl(_summ_predict, "string"))
    register_impl(
        "sentiment",
        "stub",
        ModelImpl(
            _sent_predict,
            "double",
            state={"pos": POS_WORDS, "neg": NEG_WORDS},
            broadcast=True,
        ),
    )


register_default_stubs()
