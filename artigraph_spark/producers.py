"""Producer: a versioned computation from input Artifacts to output Artifacts.

Parity with /root/reference/src/arti/producers/__init__.py:
  - class fields are input Artifacts (:56-70); ``build(**inputs)`` computes
    outputs (:71-94); optional ``map(**StoragePartitions)`` declares
    per-partition dependencies (:271-298); optional ``validate_outputs``
    gates writes (:76-94).
  - signatures are validated at class-definition time against the declared
    views (:108-307): build params must match the input fields; return
    annotations define output types; all outputs share one partitioning
    scheme (:212-219).
  - ``compute_input_fingerprint`` = fp(class) ⊕ fp(version) ⊕ ⊕(input
    partition content fps) — pure content+code identity (:326-346).
  - ``@producer`` builds a Producer subclass from a function (:418-461).

Spark-native difference: the default Collection view is a lazy DataFrame, so
``build`` bodies express distributed plans; scalar views remain driver-local.
"""

from __future__ import annotations

import inspect
from typing import Any, ClassVar, get_type_hints

from artigraph_spark.artifacts import Artifact
from artigraph_spark.fingerprint import Fingerprint
from artigraph_spark.internal.models import Model
from artigraph_spark.partitions import PartitionKey
from artigraph_spark.storage import StoragePartition
from artigraph_spark.versions import SemVer, Version

# output PartitionKey -> {input field name -> partitions feeding it}
PartitionDependencies = dict[PartitionKey, dict[str, tuple[StoragePartition, ...]]]
InputPartitions = dict[str, tuple[StoragePartition, ...]]


class ProducerOutput(Model):
    producer_fingerprint: Fingerprint
    position: int
    # Instance reference for dependency walking; identity is carried by
    # producer_fingerprint (this field is never fingerprinted — the whole
    # ProducerOutput is excluded from Artifact fingerprints).
    producer: Any = None


class Producer(Model):
    version: ClassVar[Version] = SemVer(major=0, minor=0, patch=1)

    _input_names: ClassVar[tuple[str, ...]] = ()
    _output_count: ClassVar[int] = 1

    # -- class-time validation ----------------------------------------------

    @classmethod
    def __pydantic_init_subclass__(cls, **kwargs: Any) -> None:
        # Runs after pydantic has collected model_fields (the reference uses
        # the same hook chain, producers/__init__.py:108+).
        super().__pydantic_init_subclass__(**kwargs)
        if inspect.isabstract(cls) or cls.__name__ == "Producer":
            return
        build = getattr(cls, "build", None)
        if build is None or build is Producer.build:
            raise TypeError(f"{cls.__name__} must define build()")
        cls._validate_fields()
        cls._validate_build_signature()
        cls._validate_map_signature()

    @classmethod
    def _artifact_fields(cls) -> dict[str, Any]:
        return {
            name: field
            for name, field in cls.model_fields.items()
            if name != "version"
        }

    @classmethod
    def _validate_fields(cls) -> None:
        for name, field in cls._artifact_fields().items():
            ann = field.annotation
            if not (isinstance(ann, type) and issubclass(ann, Artifact)):
                raise TypeError(
                    f"{cls.__name__}.{name} must be annotated with an Artifact subclass, got {ann!r}"
                )
        cls._input_names = tuple(cls._artifact_fields())

    @classmethod
    def _validate_build_signature(cls) -> None:
        sig = inspect.signature(cls.build)
        params = [p for p in sig.parameters.values() if p.name != "self"]
        names = tuple(p.name for p in params)
        if set(names) != set(cls._input_names):
            raise TypeError(
                f"{cls.__name__}.build parameters {names} must match input fields "
                f"{cls._input_names}"
            )
        for p in params:
            if p.annotation is inspect.Parameter.empty:
                raise TypeError(
                    f"{cls.__name__}.build parameter {p.name!r} needs a view annotation"
                )
        ret = sig.return_annotation
        if ret is inspect.Signature.empty:
            raise TypeError(f"{cls.__name__}.build needs a return annotation")
        # Resolve PEP 563 string annotations before shape inspection.
        try:
            ret = get_type_hints(cls.build).get("return", ret)
        except Exception:
            pass
        if _is_tuple_annotation(ret):
            if Ellipsis in ret.__args__:
                # tuple[X, ...] would count Ellipsis as an output slot;
                # outputs map positionally to artifacts, so arity is fixed.
                raise TypeError(
                    f"{cls.__name__}.build may not return a variadic tuple "
                    "(tuple[X, ...]); declare a fixed number of outputs"
                )
            cls._output_count = len(ret.__args__)
        else:
            cls._output_count = 1

    @classmethod
    def _validate_map_signature(cls) -> None:
        map_fn = getattr(cls, "map", None)
        if map_fn is None or map_fn is Producer.map:
            return
        sig = inspect.signature(map_fn)
        names = {p.name for p in sig.parameters.values() if p.name != "self"}
        if names != set(cls._input_names):
            raise TypeError(
                f"{cls.__name__}.map parameters {sorted(names)} must match input fields "
                f"{sorted(cls._input_names)}"
            )

    # -- runtime surface ----------------------------------------------------

    def build(self, **inputs: Any) -> Any:  # pragma: no cover - abstract
        raise NotImplementedError

    def map(self, **input_partitions: tuple[StoragePartition, ...]) -> PartitionDependencies:
        """Default mapping: one NotPartitioned output key depending on ALL
        partitions of every input (reference default, producers:280-293).
        Override for 1:1 date maps etc. — metadata-sized, driver-side."""
        return {
            PartitionKey.not_partitioned(): {
                name: tuple(parts) for name, parts in input_partitions.items()
            }
        }

    def validate_outputs(self, *outputs: Any) -> tuple[bool, str]:
        return True, "ok"

    # -- identity -----------------------------------------------------------

    @classmethod
    def class_fingerprint(cls) -> Fingerprint:
        return Fingerprint.from_string(f"Producer:{cls.__qualname__}").combine(
            cls.version.fingerprint
        )

    @classmethod
    def compute_input_fingerprint(
        cls, dependencies: dict[str, tuple[StoragePartition, ...]]
    ) -> Fingerprint:
        """fp(class) ⊕ fp(version) ⊕ hash(sorted name+key-bound content fp
        terms) — path-independent, so reverting data re-hits memoized
        outputs. Each content fp is BOUND to its parameter name (a bare XOR
        of content fps would give div(a=x, b=y) and div(a=y, b=x) the same
        memoization key) and its partition key, and the terms hash as one
        sorted multiset so duplicate-content partitions cannot cancel."""
        if set(dependencies) != set(cls._input_names):
            raise ValueError(
                f"Mismatched dependency inputs; expected {set(cls._input_names)}, "
                f"got {set(dependencies)}"
            )
        fp = cls.class_fingerprint()
        # One hash over the term MULTISET, each term binding the content fp
        # to its parameter name AND partition key. Per-term XOR would cancel
        # byte-identical partitions pairwise (an input of two duplicate date
        # partitions would memoize as if it had neither).
        terms: list[str] = []
        for name, partitions in sorted(dependencies.items()):
            for p in partitions:
                if p.content_fingerprint.is_empty:
                    raise ValueError(
                        f"partition {p.path} has no content fingerprint; snapshot first"
                    )
                terms.append(
                    f"{name}:{p.partition_key.canonical()}:{p.content_fingerprint.key}"
                )
        return fp.combine(Fingerprint.from_multiset(terms))

    def inputs(self) -> dict[str, Artifact]:
        return {name: getattr(self, name) for name in self._input_names}

    def out(self, *outputs: Artifact) -> Artifact | tuple[Artifact, ...]:
        """Bind output artifacts (positional). With no args, synthesizes
        plain artifacts from the build return annotation's inferred types."""
        if not outputs:
            outputs = tuple(
                Artifact(type=t) for t in self._infer_output_types()
            )
        if len(outputs) != self._output_count:
            raise ValueError(
                f"{type(self).__name__} produces {self._output_count} outputs, "
                f"got {len(outputs)}"
            )
        bound = tuple(
            a.with_producer_output(
                ProducerOutput(
                    producer_fingerprint=self.fingerprint, position=i, producer=self
                )
            )
            for i, a in enumerate(outputs)
        )
        self.__dict__["__bound_outputs__"] = bound
        return bound if len(bound) > 1 else bound[0]

    @classmethod
    def _infer_output_types(cls) -> list[Any]:
        from artigraph_spark.types.python import to_artigraph

        hints = get_type_hints(cls.build)
        ret = hints.get("return")
        anns = list(ret.__args__) if _is_tuple_annotation(ret) else [ret]
        types = []
        for ann in anns:
            try:
                types.append(to_artigraph(ann))
            except NotImplementedError:
                from artigraph_spark import types as at

                types.append(at.Struct(fields={"value": at.String()}))
        return types


def _is_tuple_annotation(ann: Any) -> bool:
    import typing

    return typing.get_origin(ann) is tuple


def producer(
    *,
    version: Version | None = None,
    map: Any | None = None,  # noqa: A002 - mirrors reference API
    validate_outputs: Any | None = None,
    name: str | None = None,
) -> Any:
    """Decorator: build a Producer subclass from a function's annotations.

        @producer(version=SemVer(major=1))
        def total_spend(transactions: DataFrame) -> float: ...

    Field types come from a companion ``inputs`` mapping on the wrapped
    function or are declared via explicit Artifact subclass annotations on
    the producer class path; here each parameter becomes an ``Artifact``
    field (the graph assigns concrete artifacts at wiring time).
    """

    def wrap(fn: Any) -> type[Producer]:
        sig = inspect.signature(fn)
        params = list(sig.parameters)
        # Resolve PEP 563 string annotations NOW, in the caller's module
        # globals — the generated build lives in this module, where names
        # like DataFrame may not resolve later.
        try:
            resolved = get_type_hints(fn)
        except Exception:
            resolved = dict(fn.__annotations__)
        namespace: dict[str, Any] = {
            "__annotations__": {p: Artifact for p in params},
            "__module__": fn.__module__,
            "__qualname__": name or fn.__name__,
        }
        if version is not None:
            namespace["version"] = version

        def build(self: Producer, **inputs: Any) -> Any:
            return fn(**inputs)

        build.__signature__ = inspect.Signature(  # type: ignore[attr-defined]
            parameters=[inspect.Parameter("self", inspect.Parameter.POSITIONAL_OR_KEYWORD)]
            + [
                inspect.Parameter(
                    p,
                    inspect.Parameter.KEYWORD_ONLY,
                    annotation=resolved.get(p, sig.parameters[p].annotation),
                )
                for p in params
            ],
            return_annotation=resolved.get("return", sig.return_annotation),
        )
        build.__annotations__ = dict(resolved)
        namespace["build"] = build
        # map/validate_outputs are plain functions from the caller — wrap
        # them so binding as methods doesn't shove the instance into their
        # first user argument.
        if map is not None:
            map_fn = map

            def map_method(self: Producer, **input_partitions: Any) -> Any:
                return map_fn(**input_partitions)

            map_method.__signature__ = inspect.signature(map_fn).replace(  # type: ignore[attr-defined]
                parameters=[inspect.Parameter("self", inspect.Parameter.POSITIONAL_OR_KEYWORD)]
                + list(inspect.signature(map_fn).parameters.values())
            )
            namespace["map"] = map_method
        if validate_outputs is not None:
            validate_fn = validate_outputs

            def validate_method(self: Producer, *outputs: Any) -> Any:
                return validate_fn(*outputs)

            namespace["validate_outputs"] = validate_method
        cls = type(name or fn.__name__, (Producer,), namespace)
        return cls

    return wrap
