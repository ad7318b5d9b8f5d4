"""Views: the in-memory representation producer code works with.

Parity with /root/reference/src/arti/views/__init__.py: a registry mapping
python annotations to View classes, used to validate producer signatures and
pick IO handlers. The DataFrame view is the engine's default for Collections
(the reference's default was ``list[dict]`` — kept here as an explicit,
driver-local escape hatch for small data).
"""

from __future__ import annotations

from typing import Any, ClassVar, get_origin

from pyspark.sql import DataFrame

from artigraph_spark import types as at
from artigraph_spark.internal.models import Model


class View(Model):
    """A representation class; ``python_type`` is what build() receives."""

    python_type: ClassVar[Any]

    _registry: ClassVar[list[type[View]]] = []

    def __init_subclass__(cls, **kwargs: Any) -> None:
        super().__init_subclass__(**kwargs)
        View._registry.append(cls)

    @classmethod
    def matches_annotation(cls, annotation: Any) -> bool:
        return annotation is cls.python_type or get_origin(annotation) is cls.python_type

    @classmethod
    def get_class_for(cls, annotation: Any) -> type[View]:
        # Latest registration wins so user-defined views can override built-ins.
        for view in reversed(View._registry):
            if view.matches_annotation(annotation):
                return view
        raise LookupError(f"no View registered for annotation {annotation!r}")

    @classmethod
    def supports_type(cls, type_: at.Type) -> bool:
        return True


class SparkDataFrameView(View):
    """The default Collection view: a lazy Spark DataFrame (never collected
    by the engine; producer bodies stay distributed)."""

    python_type: ClassVar[Any] = DataFrame

    @classmethod
    def supports_type(cls, type_: at.Type) -> bool:
        return isinstance(type_, at.Collection | at.Struct)


class PandasDataFrameView(View):
    """Driver-local pandas DataFrame (Arrow-bridged via Spark's
    toPandas/createDataFrame) — small data only; the distributed pandas
    path is applyInPandas/mapInPandas inside a producer body. Type
    support is delegated to the pandas TypeSystem: a Collection is
    viewable iff its row Struct converts to a pandas frame."""

    # Replaced with pd.DataFrame below on successful import. The fallback is
    # a sentinel no annotation can ever `is`-match — None would make
    # matches_annotation true for EVERY non-generic annotation
    # (get_origin(x) is None) and shadow SparkDataFrameView in the
    # reversed-registry scan.
    class _NoPandas:  # pragma: no cover - import-failure sentinel
        pass

    python_type: ClassVar[Any] = _NoPandas

    @classmethod
    def supports_type(cls, type_: at.Type) -> bool:
        if not isinstance(type_, at.Collection | at.Struct):
            return False
        try:
            from artigraph_spark.types.pandas import collection_to_pandas_exemplar

            collection_to_pandas_exemplar(type_)
            return True
        except (NotImplementedError, TypeError):
            # TypeError: a bridge handing np.dtype() something it cannot
            # interpret — "not viewable as pandas", not a crash.
            return False


try:  # pandas is a hard Spark dependency in practice, but stay import-safe
    import pandas as _pd

    PandasDataFrameView.python_type = _pd.DataFrame
except ImportError:  # pragma: no cover
    pass


class PythonListView(View):
    """Driver-local list[dict] — the reference's default; small data only."""

    python_type: ClassVar[Any] = list

    @classmethod
    def supports_type(cls, type_: at.Type) -> bool:
        return isinstance(type_, at.Collection | at.List)


class PythonScalarView(View):
    """Driver-local scalar (int/float/str/bool/...)."""

    python_type: ClassVar[Any] = object

    @classmethod
    def matches_annotation(cls, annotation: Any) -> bool:
        return annotation in (int, float, str, bool, bytes, dict)

    @classmethod
    def supports_type(cls, type_: at.Type) -> bool:
        return not isinstance(type_, at.Collection)


def view_for_annotation(annotation: Any) -> type[View]:
    return View.get_class_for(annotation)
