"""Producer versioning policies (parity with
/root/reference/src/arti/versions/__init__.py): the version's fingerprint
decides when existing outputs are invalidated. SemVer fingerprints the major
component only once major > 0 — minor/patch bumps don't backfill history
(versions/__init__.py:31-59).
"""

from __future__ import annotations

import time

from artigraph_spark.fingerprint import Fingerprint
from artigraph_spark.internal.models import Model


class Version(Model):
    @property
    def fingerprint(self) -> Fingerprint:  # type: ignore[override]
        raise NotImplementedError


class SemVer(Version):
    major: int
    minor: int = 0
    patch: int = 0

    @property
    def fingerprint(self) -> Fingerprint:
        if self.major > 0:
            return Fingerprint.from_string(f"SemVer:{self.major}")
        return Fingerprint.from_string(f"SemVer:{self.major}.{self.minor}.{self.patch}")


class GitCommit(Version):
    sha: str

    @property
    def fingerprint(self) -> Fingerprint:
        return Fingerprint.from_string(f"GitCommit:{self.sha}")


class StringVersion(Version):
    value: str

    @property
    def fingerprint(self) -> Fingerprint:
        return Fingerprint.from_string(f"String:{self.value}")


class TimestampVersion(Version):
    """Always-rebuild-ish: fingerprints the creation time (second resolution)."""

    epoch_seconds: int = 0

    def model_post_init(self, __context: object) -> None:
        if self.epoch_seconds == 0:
            object.__setattr__(self, "epoch_seconds", int(time.time()))

    @property
    def fingerprint(self) -> Fingerprint:
        return Fingerprint.from_string(f"Timestamp:{self.epoch_seconds}")
