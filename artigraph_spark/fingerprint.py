"""int64 content/identity fingerprints with XOR combination.

Mirrors the reference's fingerprint algebra
(/root/reference/src/arti/fingerprints/__init__.py:18-83): an int64 key,
``combine`` via XOR (order-independent, associative), and a distinguished
identity (0) that is the combine-neutral element. Deviations: the string
hash is sha256-derived rather than Farmhash64 (farmhash isn't available
here; any well-mixed 64-bit hash preserves the algebra — fingerprints are
identities, not interoperable values), and "empty" is modeled as ``None``
key exactly like the reference's ``Fingerprint.empty()``.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from typing import Any

_INT64_MASK = (1 << 64) - 1


def _to_signed64(v: int) -> int:
    v &= _INT64_MASK
    return v - (1 << 64) if v >= (1 << 63) else v


def hash64(data: bytes) -> int:
    """Stable 64-bit hash (first 8 bytes of sha256, big-endian, signed)."""
    return _to_signed64(int.from_bytes(hashlib.sha256(data).digest()[:8], "big"))


@dataclass(frozen=True, slots=True)
class Fingerprint:
    """An int64 identity. ``key is None`` → empty (unknown / not-yet-computed);
    ``key == 0`` → the XOR identity element."""

    key: int | None

    @classmethod
    def empty(cls) -> Fingerprint:
        return cls(key=None)

    @classmethod
    def identity(cls) -> Fingerprint:
        return cls(key=0)

    @classmethod
    def from_int(cls, v: int) -> Fingerprint:
        """Int64 fingerprint. Values outside int64 range are REJECTED (not
        wrapped) — the reference contract (tests/arti/test_fingerprints.py:
        from_int(uint64 max) raises); silent wrapping could alias a corrupted
        catalog/path fingerprint onto a valid one."""
        if not -(1 << 63) <= v < (1 << 63):
            raise ValueError(f"{v} is too large for int64")
        return cls(key=v)

    @classmethod
    def from_string(cls, s: str) -> Fingerprint:
        return cls(key=hash64(s.encode("utf-8")))

    @classmethod
    def from_bytes(cls, b: bytes) -> Fingerprint:
        return cls(key=hash64(b))

    @classmethod
    def from_multiset(cls, terms: "list[str] | tuple[str, ...] | Any") -> Fingerprint:
        """Order-independent, duplicate-COUNTING hash of a term multiset
        (sorted NUL-join). This is the safe combine for per-partition
        fingerprint terms: XOR-combining them instead cancels identical
        terms pairwise, so e.g. two byte-identical partitions would hash
        the same as zero. Terms must not contain NUL — callers escape
        (PartitionKey.canonical percent-escapes its parts)."""
        return cls.from_string("\x00".join(sorted(terms)))

    @classmethod
    def from_json(cls, value: Any) -> Fingerprint:
        """Fingerprint of a canonical-JSON rendering (sorted keys, compact)."""
        return cls.from_string(
            json.dumps(value, sort_keys=True, separators=(",", ":"), default=str)
        )

    @property
    def is_empty(self) -> bool:
        return self.key is None

    @property
    def is_identity(self) -> bool:
        return self.key == 0

    def combine(self, *others: Fingerprint) -> Fingerprint:
        """XOR-combine (order-independent). Combining with empty stays empty,
        mirroring the reference's None propagation."""
        key = self.key
        for other in others:
            if not isinstance(other, Fingerprint):
                raise TypeError(
                    f"can only combine with Fingerprint, got {other!r}"
                )
            if key is None or other.key is None:
                return Fingerprint.empty()
            key = _to_signed64(key ^ other.key)
        return Fingerprint(key=key)

    def __xor__(self, other: Fingerprint) -> Fingerprint:
        return self.combine(other)

    def __str__(self) -> str:
        return f"Fingerprint({self.key})"
