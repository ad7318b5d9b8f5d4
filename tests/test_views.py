"""View registry (mirrors tests/arti/views/test_views.py): annotation →
view resolution and type-compatibility checks."""

import pytest
from pyspark.sql import DataFrame

from artigraph_spark import types as at
from artigraph_spark.views import (
    PythonListView,
    PythonScalarView,
    SparkDataFrameView,
    View,
    view_for_annotation,
)


def test_annotation_resolution():
    assert view_for_annotation(DataFrame) is SparkDataFrameView
    assert view_for_annotation(list) is PythonListView
    assert view_for_annotation(list[dict]) is PythonListView
    assert view_for_annotation(int) is PythonScalarView
    assert view_for_annotation(float) is PythonScalarView
    assert view_for_annotation(str) is PythonScalarView


def test_unknown_annotation_raises():
    class Weird:
        pass

    with pytest.raises(LookupError, match="no View registered"):
        view_for_annotation(Weird)


def test_type_compatibility():
    coll = at.Collection(element=at.Struct(fields={"x": at.Int64()}))
    assert SparkDataFrameView.supports_type(coll)
    assert PythonListView.supports_type(coll)
    assert not PythonScalarView.supports_type(coll)
    assert PythonScalarView.supports_type(at.Int64())
    assert not SparkDataFrameView.supports_type(at.Int64())


def test_registry_is_extensible():
    class CustomView(View):
        python_type = bytes

        @classmethod
        def matches_annotation(cls, annotation):
            return annotation is bytes

    try:
        assert View.get_class_for(bytes) is CustomView
    finally:
        View._registry.remove(CustomView)
