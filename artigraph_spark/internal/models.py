"""Frozen pydantic base model with canonical-JSON fingerprinting.

Parity with the reference's Model (/root/reference/src/arti/internal/
models.py:64-166): immutable ("frozen") pydantic models whose ``fingerprint``
is a 64-bit hash of the class name + a canonical dump of the fingerprintable
fields. Fields annotated ``SkipFingerprint`` (descriptions, annotations,
display-only metadata) are excluded, so doc edits never invalidate built
data. Built on pydantic v2 rather than v1 — the public behavior (frozen,
validate-on-assignment-never, cached fingerprint) is what's preserved.
"""

from __future__ import annotations

from typing import Annotated, Any, ClassVar, get_args, get_origin

from pydantic import BaseModel, ConfigDict

from artigraph_spark.fingerprint import Fingerprint


class _SkipFingerprintMarker:
    """Annotation marker: exclude this field from the model fingerprint."""


def SkipFingerprint(tp: Any) -> Any:  # noqa: N802 - type-constructor style
    return Annotated[tp, _SkipFingerprintMarker]


def _field_skipped(annotation: Any) -> bool:
    if get_origin(annotation) is Annotated:
        return any(
            arg is _SkipFingerprintMarker or isinstance(arg, _SkipFingerprintMarker)
            for arg in get_args(annotation)[1:]
        )
    return False


class Model(BaseModel):
    model_config = ConfigDict(frozen=True, extra="forbid", arbitrary_types_allowed=True)

    _fingerprint_excludes: ClassVar[frozenset[str]] = frozenset()

    @classmethod
    def _skipped_fields(cls) -> set[str]:
        skipped = set(cls._fingerprint_excludes)
        for name, field in cls.model_fields.items():
            if _field_skipped(field.annotation) or field.metadata and any(
                m is _SkipFingerprintMarker for m in field.metadata
            ):
                skipped.add(name)
        return skipped

    def fingerprint_dump(self) -> Any:
        """Canonical, fingerprint-stable representation: class qualname +
        per-field dumps with skipped fields removed (recursively honoring
        nested Models' own skips)."""

        def dump(v: Any) -> Any:
            if isinstance(v, Model):
                return v.fingerprint_dump()
            if isinstance(v, Fingerprint):
                return {"__fingerprint__": v.key}
            if isinstance(v, BaseModel):
                return v.model_dump(mode="json")
            if isinstance(v, dict):
                return {str(k): dump(x) for k, x in sorted(v.items(), key=lambda kv: str(kv[0]))}
            if isinstance(v, (list, tuple)):
                return [dump(x) for x in v]
            if isinstance(v, frozenset | set):
                return sorted((dump(x) for x in v), key=repr)
            return v

        skipped = self._skipped_fields()
        return {
            "__class__": type(self).__qualname__,
            **{
                name: dump(getattr(self, name))
                for name in sorted(self.__class__.model_fields)
                if name not in skipped
            },
        }

    @property
    def fingerprint(self) -> Fingerprint:
        cached = self.__dict__.get("__fp_cache__")
        if cached is None:
            cached = Fingerprint.from_json(self.fingerprint_dump())
            object.__setattr__(self, "__fp_cache__", cached)
        return cached
