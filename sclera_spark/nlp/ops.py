"""NLP relational operators: `TEXT ['lang'] lib.op(args) IN col [TO cols]`.

Reference: analytics/nlp/expr/NlpRelOp.scala:28-56 — a pluggable service
(default OPENNLP) transforms a text column into extra columns/rows.

Spark lowering: a registry of named ops, each a function
(df, text_col, args) -> DataFrame. Built-ins are deterministic, pure
expression/regex implementations (no model downloads in this container);
heavyweight backends (spark-nlp, spaCy) can be registered at runtime and
are import-guarded.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny sentiment lexicon for the deterministic built-in scorer
_POS = "good great excellent love happy best wonderful amazing nice fantastic".split()
_NEG = "bad terrible awful hate sad worst horrible poor disappointing broken".split()


def _tokens(text):
    return F.filter(
        F.split(F.regexp_replace(F.lower(text), r"[^\p{L}\p{N}\s]", " "), r"\s+"),
        lambda t: t != "",
    )


def op_tokenize(df: DataFrame, text_col: str, out_col: str = "token") -> DataFrame:
    """One output row per token (explode) — the Union-flavor transform."""
    return df.withColumn(out_col, F.explode(_tokens(F.col(text_col))))


def op_sentences(df: DataFrame, text_col: str, out_col: str = "sentence") -> DataFrame:
    sents = F.filter(
        F.transform(F.split(F.col(text_col), r"(?<=[.!?])\s+"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    return df.withColumn(out_col, F.explode(sents))


def op_sentiment(df: DataFrame, text_col: str, out_col: str = "sentiment") -> DataFrame:
    """Lexicon-vote sentiment in [-1, 1] — deterministic built-in."""
    toks = _tokens(F.col(text_col))
    pos_arr = F.array(*[F.lit(w) for w in _POS])
    neg_arr = F.array(*[F.lit(w) for w in _NEG])
    pos = F.size(F.filter(toks, lambda t: F.array_contains(pos_arr, t)))
    neg = F.size(F.filter(toks, lambda t: F.array_contains(neg_arr, t)))
    denom = F.greatest(pos + neg, F.lit(1)).cast("double")
    return df.withColumn(out_col, (pos - neg) / denom)


def op_ngrams(df: DataFrame, text_col: str, n: int = 2, out_col: str = "ngram") -> DataFrame:
    toks = _tokens(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return df.withColumn(out_col, F.explode(grams))


def op_entities(
    df: DataFrame, text_col: str, out_col: str = "entity", type_col: str | None = None
) -> DataFrame:
    """Capitalized-span entity extraction (regex heuristic; a real NER
    backend can be registered over this name). With ``type_col`` a second
    result column tags multi-word spans NAME vs single-word TERM — the
    reference's multi-column resCols surface (`TEXT op IN c TO (e, t)`,
    SqlQueryParser.scala:1031-1037)."""
    ents = F.regexp_extract_all(
        F.col(text_col), F.lit(r"([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)"), F.lit(1)
    )
    out = df.withColumn(out_col, F.explode(ents))
    if type_col:
        out = out.withColumn(
            type_col,
            F.when(F.size(F.split(F.col(out_col), " ")) > 1, "NAME").otherwise("TERM"),
        )
    return out


@dataclass
class NlpRegistry:
    ops: dict[str, Callable[..., DataFrame]] = field(default_factory=dict)

    def __post_init__(self) -> None:
        for name, fn in {
            "TOKENIZE": op_tokenize,
            "SENTENCES": op_sentences,
            "SENTIMENT": op_sentiment,
            "NGRAMS": op_ngrams,
            "ENTITIES": op_entities,
        }.items():
            self.ops[name] = fn
        # optional heavyweight backend (not present in this container)
        try:  # pragma: no cover
            import sparknlp  # noqa: F401
        except ImportError:
            pass

    def register(self, name: str, fn: Callable[..., DataFrame]) -> None:
        self.ops[name.upper()] = fn

    def apply(self, op: str, df: DataFrame, text_col: str, **kwargs) -> DataFrame:
        fn = self.ops.get(op.upper())
        if fn is None:
            raise KeyError(f"unknown NLP op: {op}")
        return fn(df, text_col, **kwargs)


def nlp_op(op: str, df: DataFrame, text_col: str, **kwargs) -> DataFrame:
    return NlpRegistry().apply(op, df, text_col, **kwargs)
