"""Artifact: a dataset template = Type + Format + Storage.

Parity with /root/reference/src/arti/artifacts/__init__.py:24-116: Artifacts
are declarative (no data inside), carry non-fingerprinted annotations, hide
``producer_output`` from the fingerprint so connecting a producer doesn't
invalidate downstream data, and ``Artifact.cast`` coerces python literals
into literal-storage artifacts with inferred Types.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING, Any, ClassVar

from artigraph_spark import types as at
from artigraph_spark.formats import JSON, Format, Parquet
from artigraph_spark.internal.models import Model, SkipFingerprint
from artigraph_spark.storage import LocalFile, Storage, StringLiteral
from artigraph_spark.types.python import infer_type

if TYPE_CHECKING:
    from artigraph_spark.producers import ProducerOutput


def _has_non_string_dict_keys(value: Any) -> bool:
    if isinstance(value, dict):
        return any(not isinstance(k, str) for k in value) or any(
            _has_non_string_dict_keys(v) for v in value.values()
        )
    if isinstance(value, (list, tuple)):
        return any(_has_non_string_dict_keys(v) for v in value)
    return False


class Artifact(Model):
    type: at.Type
    format: Format = Parquet()
    storage: Storage = LocalFile()
    annotations: SkipFingerprint(dict[str, Any]) = {}
    # Quality gates evaluated on build (one agg pass per output partition;
    # see artigraph_spark.statistics). Not fingerprinted: tightening a
    # threshold must not invalidate already-built data.
    statistics: SkipFingerprint(tuple[Any, ...]) = ()

    # Set when a Producer output is bound to this artifact; excluded from the
    # fingerprint so adding/changing a producer doesn't cascade-invalidate
    # (reference: artifacts/__init__.py:44-56).
    producer_output: Any = None

    _fingerprint_excludes: ClassVar[frozenset[str]] = frozenset({"producer_output"})

    @classmethod
    def cast(cls, value: Any) -> Artifact:
        """Coerce a value into an Artifact:
        - Artifact → itself
        - Producer → its single output (error if multiple)
        - python literal → inferred Type + StringLiteral storage + JSON format
        """
        from artigraph_spark.producers import Producer

        if isinstance(value, Artifact):
            return value
        if isinstance(value, Producer):
            outputs = value.out()
            if isinstance(outputs, tuple):
                raise ValueError(
                    f"{type(value).__name__} has multiple outputs; assign each explicitly"
                )
            return outputs
        inferred = infer_type(value)
        if _has_non_string_dict_keys(value):
            # json.dumps would silently stringify the keys, so the stored
            # literal would violate its declared Map key type on round-trip.
            raise NotImplementedError(
                f"Unable to serialize literal {value!r} for StringLiteral "
                "storage: JSON requires string dict keys"
            )
        try:
            payload = json.dumps(value)
        except TypeError:
            # Typed but not JSON-serializable (date/datetime/bytes...) — the
            # reference marks these literals not-yet-implemented
            # (tests/arti/artifacts/test_artifact.py:57-68); keep the cast
            # error contract rather than leaking a raw TypeError.
            raise NotImplementedError(
                f"Unable to serialize literal {value!r} for StringLiteral storage"
            ) from None
        return cls(type=inferred, format=JSON(), storage=StringLiteral(value=payload))

    @property
    def is_produced(self) -> bool:
        return self.producer_output is not None

    @property
    def partition_key_types(self) -> dict[str, Any]:
        from artigraph_spark.partitions import PartitionKey

        return PartitionKey.types_from(self.type)

    def with_producer_output(self, output: ProducerOutput) -> Artifact:
        return self.model_copy(update={"producer_output": output})
