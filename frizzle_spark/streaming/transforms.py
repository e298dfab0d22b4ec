"""Transformer stages — the frizzle ``FrizTransformer`` equivalent.

Reference semantics (transform.go:8-59): a transformer contributes a
``ReceiveTransform`` applied to every incoming Msg and a
``SendTransform`` applied before every sink write, registered in order
via ``WithTransformer`` (transform.go:16-21).  Here a transform is a
``DataFrame -> DataFrame`` function over the envelope schema — a
declarative column stage Catalyst can fuse into the stream plan, not an
opaque per-record closure.

``SepTransformer`` ports the reference's only concrete transformer
(``SimpleSepTransformer``, transform.go:23-52): append separator on send
iff absent, strip on receive iff present.  DIVERGENCE (documented in
SURVEY.md §2.1): the reference slices ``d[len(d)-len(sep):]`` without a
length guard and panics when payload is shorter than the separator
(transform.go:36,47); we guard with ``length(data) >= length(sep)`` and
leave short payloads unchanged.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TransformFn = Callable[[DataFrame], DataFrame]


def _identity(df: DataFrame) -> DataFrame:
    return df


@dataclass(frozen=True)
class Transformer:
    """A receive-side and a send-side DataFrame stage (either may be a no-op)."""

    receive: TransformFn = field(default=_identity)
    send: TransformFn = field(default=_identity)


def _ends_with(data: Column, sep: bytes) -> Column:
    n = len(sep)
    return (F.length(data) >= n) & (
        F.substring(data, -n, n) == F.lit(bytearray(sep))
    )


def sep_transformer(sep: bytes, column: str = "data") -> Transformer:
    """Separator append-on-send / strip-on-receive over a BINARY column."""
    n = len(sep)
    lit_sep = F.lit(bytearray(sep))

    def send(df: DataFrame) -> DataFrame:
        data = F.col(column)
        return df.withColumn(
            column,
            F.when(_ends_with(data, sep), data).otherwise(F.concat(data, lit_sep)),
        )

    def receive(df: DataFrame) -> DataFrame:
        data = F.col(column)
        return df.withColumn(
            column,
            F.when(
                _ends_with(data, sep),
                F.substring(data, 1, F.length(data) - n),
            ).otherwise(data),
        )

    return Transformer(receive=receive, send=send)


def chain(transforms: list[TransformFn], df: DataFrame) -> DataFrame:
    """Apply stages in registration order (frizzle.go:99-102, 118-121)."""
    for t in transforms:
        df = t(df)
    return df
