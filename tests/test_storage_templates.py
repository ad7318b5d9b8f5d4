"""Per-component path-template contracts.

Mirrors /root/reference/tests/arti/storage/test_storage.py:175-237 (custom
"{i.value:02}/{input_fingerprint}" templates, generation error shapes,
discovery over component layouts) and
/root/reference/tests/arti/partitions/test_partitions.py:75-129
(from_components merging: DateField from Y/m/d or iso, IntField from
value/hex, NullField sentinel).
"""

from __future__ import annotations

import datetime
import os

import pytest

from artigraph_spark.fingerprint import Fingerprint
from artigraph_spark.partitions import (
    DateField,
    IntField,
    NullField,
    PartitionKey,
    StringField,
)
from artigraph_spark.storage import LocalFile


# --- from_components (partition-field reconstruction) -------------------------


def test_date_field_from_components():
    k = DateField(key=datetime.date(1970, 1, 1))
    assert DateField.from_components(Y="1970", m="1", d="1") == k
    assert DateField.from_components(Y="1970", m="01", d="01") == k  # zero-padded
    assert DateField.from_components(iso="1970-01-01") == k
    assert DateField.from_components(value="1970-01-01") == k
    with pytest.raises(ValueError, match="Unable to parse 'DateField'"):
        DateField.from_components(junk="abc")
    with pytest.raises(ValueError, match="Unable to parse 'DateField'"):
        DateField.from_components(Y="1970", m="1")  # incomplete


def test_int_field_from_components():
    k = IntField(key=1)
    assert k.components["hex"] == "0x1"
    assert IntField.from_components(value="1") == k
    assert IntField.from_components(hex="0x1") == k
    assert IntField.from_components(value="1", hex="0x1") == k
    with pytest.raises(ValueError, match="disagree"):
        IntField.from_components(value="1", hex="0x2")
    with pytest.raises(ValueError, match="Unable to parse 'IntField'"):
        IntField.from_components(junk="abc")


def test_null_field_from_components():
    assert NullField.from_components(value="None") == NullField()
    assert NullField.from_components(value="_NONE") == NullField()
    with pytest.raises(ValueError, match="can only be used with 'None'"):
        NullField.from_components(value="abc")
    with pytest.raises(ValueError, match="Unable to parse 'NullField'"):
        NullField.from_components(junk="abc")


def test_string_field_from_components():
    assert StringField.from_components(value="x") == StringField(key="x")
    with pytest.raises(ValueError, match="Unable to parse 'StringField'"):
        StringField.from_components(junk="x")


def test_component_values_are_typed():
    d = DateField(key=datetime.date(2021, 3, 4))
    assert d.component_value("Y") == 2021
    assert d.component_value("m") == 3  # int, so "{date.m:02}" pads
    assert format(d.component_value("m"), "02") == "03"
    assert d.component_value("iso") == "2021-03-04"
    i = IntField(key=5)
    assert i.component_value("value") == 5
    assert i.component_value("hex") == "0x5"


# --- generation with custom component templates --------------------------------


def _storage(tmp_path, template: str) -> LocalFile:
    s = LocalFile(root=str(tmp_path))
    return s.model_copy(update={"template": f"{tmp_path}/{template}"})


def test_generate_partition_component_template(tmp_path):
    # The reference's exact case: "{i.value:02}/{input_fingerprint}" with
    # i=5, fp=10 renders "05/10" (test_storage.py:192-213).
    s = _storage(tmp_path, "{i.value:02}/" + "_fingerprint={input_fingerprint}")
    key = PartitionKey(fields={"i": IntField(key=5)})
    p = s.generate_partition(key, Fingerprint.from_int(10))
    assert p.path == f"{tmp_path}/05/_fingerprint=10"


def test_generate_partition_date_components(tmp_path):
    s = _storage(tmp_path, "y={date.Y}/m={date.m:02}/d={date.d:02}")
    key = PartitionKey(fields={"date": DateField(key=datetime.date(2021, 3, 4))})
    p = s.generate_partition(key, Fingerprint.empty())
    assert p.path == f"{tmp_path}/y=2021/m=03/d=04"


def test_generate_partition_mismatched_key_raises(tmp_path):
    s = _storage(tmp_path, "{i.value}")
    with pytest.raises(KeyError, match="i"):
        s.generate_partition(
            PartitionKey(fields={"j": IntField(key=5)}), Fingerprint.empty()
        )


def test_generate_partition_missing_key_raises(tmp_path):
    s = _storage(tmp_path, "{i.value}")
    with pytest.raises(ValueError, match=r"Expected partition key with \('i',\)"):
        s.generate_partition(PartitionKey.not_partitioned(), Fingerprint.empty())


def test_generate_partition_unexpected_key_raises(tmp_path):
    s = _storage(tmp_path, "hard/coded")
    with pytest.raises(ValueError, match="Expected no partition key but got"):
        s.generate_partition(
            PartitionKey(fields={"i": IntField(key=5)}), Fingerprint.empty()
        )


def test_generate_partition_fingerprint_required(tmp_path):
    s = _storage(tmp_path, "{i.value}/fp={input_fingerprint}")
    key = PartitionKey(fields={"i": IntField(key=5)})
    with pytest.raises(ValueError, match="requires an input_fingerprint"):
        s.generate_partition(key, Fingerprint.empty())


def test_generate_partition_fingerprint_unexpected(tmp_path):
    s = _storage(tmp_path, "{i.value}")
    key = PartitionKey(fields={"i": IntField(key=5)})
    with pytest.raises(ValueError, match="does not specify a .input_fingerprint."):
        s.generate_partition(key, Fingerprint.from_int(10))


# --- discovery over custom component layouts -----------------------------------


def test_discover_component_template_round_trip(tmp_path):
    s = _storage(tmp_path, "{i.value}/file")
    for i in range(3):
        os.makedirs(f"{tmp_path}/{i}", exist_ok=True)
        with open(f"{tmp_path}/{i}/file", "w") as f:
            f.write("x")
    parts = s.discover_partitions({"i": IntField})
    assert len(parts) == 3
    assert sorted(p.partition_key.values()["i"] for p in parts) == [0, 1, 2]
    # Generation and discovery agree byte-for-byte on paths.
    for p in parts:
        key = p.partition_key
        assert s.generate_partition(key, Fingerprint.empty()).path == p.path


def test_discover_multi_component_date_layout(tmp_path):
    # year=/month=/day= layout reconstructed into ONE DateField via
    # from_components — the contract {partition_key_spec} can't express.
    s = _storage(tmp_path, "y={date.Y}/m={date.m:02}/d={date.d:02}")
    for iso in ("2021-03-04", "2021-12-31"):
        d = datetime.date.fromisoformat(iso)
        os.makedirs(f"{tmp_path}/y={d.year}/m={d.month:02}/d={d.day:02}", exist_ok=True)
    parts = s.discover_partitions({"date": DateField})
    assert sorted(p.partition_key.values()["date"].isoformat() for p in parts) == [
        "2021-03-04",
        "2021-12-31",
    ]
    for p in parts:
        assert s.generate_partition(p.partition_key, Fingerprint.empty()).path == p.path


def test_discover_repeated_placeholder_backreference(tmp_path):
    # The same component twice must MATCH both times (backreference).
    s = _storage(tmp_path, "{i.value}/copy={i.value}")
    os.makedirs(f"{tmp_path}/1/copy=1", exist_ok=True)
    os.makedirs(f"{tmp_path}/2/copy=9", exist_ok=True)  # mismatched → skipped
    parts = s.discover_partitions({"i": IntField})
    assert len(parts) == 1
    assert parts[0].partition_key.values()["i"] == 1


def test_discover_bare_fingerprint_segment(tmp_path):
    # Reference layout (tests/arti/storage/test_local_storage.py:87-110):
    # "{date.Y}/{date.m}/{date.d}/{input_fingerprint}/test" — the input
    # fingerprint is a bare path segment, not a "_fingerprint=" pair.
    s = _storage(tmp_path, "{date.Y}/{date.m:02}/{date.d:02}/{input_fingerprint}/test")
    key = PartitionKey(fields={"date": DateField(key=datetime.date(1970, 1, 2))})
    p = s.generate_partition(key, Fingerprint.from_int(42))
    assert p.path == f"{tmp_path}/1970/01/02/42/test"
    os.makedirs(os.path.dirname(p.path), exist_ok=True)
    with open(p.path, "w") as f:
        f.write("x")
    parts = s.discover_partitions({"date": DateField})
    assert len(parts) == 1
    assert parts[0].path == p.path
    assert parts[0].partition_key == key
    assert parts[0].input_fingerprint == Fingerprint.from_int(42)


def test_discover_unknown_key_in_template_raises(tmp_path):
    s = _storage(tmp_path, "{junk.value}")
    with pytest.raises(ValueError, match="No 'junk' partition key found"):
        s.discover_partitions({"i": IntField})


def test_discover_template_missing_key_raises(tmp_path):
    s = _storage(tmp_path, "{x.value}/plain")
    with pytest.raises(ValueError, match="Expected to find partition fields"):
        s.discover_partitions({"x": IntField, "y": IntField})


def test_discover_unparseable_value_skipped(tmp_path):
    s = _storage(tmp_path, "{i.value}/file")
    os.makedirs(f"{tmp_path}/notanint", exist_ok=True)
    with open(f"{tmp_path}/notanint/file", "w") as f:
        f.write("x")
    assert s.discover_partitions({"i": IntField}) == []


# --- review-hardening edges ----------------------------------------------------


def test_discover_oversized_fingerprint_skipped(tmp_path):
    # A stray _fingerprint dir beyond int64 is junk, not a crash.
    s = _storage(tmp_path, "{i.value}/_fingerprint={input_fingerprint}")
    os.makedirs(f"{tmp_path}/1/_fingerprint=18446744073709551616", exist_ok=True)
    os.makedirs(f"{tmp_path}/2/_fingerprint=42", exist_ok=True)
    parts = s.discover_partitions({"i": IntField})
    assert len(parts) == 1
    assert parts[0].input_fingerprint == Fingerprint.from_int(42)


def test_generate_unreferenced_key_field_raises(tmp_path):
    # {i:5,j:7} and {i:5,j:8} would both render "<root>/5" — refuse.
    s = _storage(tmp_path, "{i.value}")
    key = PartitionKey(fields={"i": IntField(key=5), "j": IntField(key=7)})
    with pytest.raises(ValueError, match=r"\['j'\] are not referenced"):
        s.generate_partition(key, Fingerprint.empty())


def test_discover_unreconstructable_component_set_raises(tmp_path):
    # {Y, iso} is not a set DateField.from_components accepts: fail loudly at
    # spec build instead of silently discovering nothing.
    s = _storage(tmp_path, "{date.Y}/{date.iso}/f")
    with pytest.raises(ValueError, match="Cannot reconstruct partition field 'date'"):
        s.discover_partitions({"date": DateField})
    # A single un-mergeable component is equally invalid.
    s2 = _storage(tmp_path, "{date.Y}/f")
    with pytest.raises(ValueError, match="Cannot reconstruct partition field 'date'"):
        s2.discover_partitions({"date": DateField})


def test_discover_same_component_different_specs(tmp_path):
    # "{i.value:02}/{i.value}" renders "05/5" — discovery must not demand the
    # two renderings be byte-identical.
    s = _storage(tmp_path, "{i.value:02}/{i.value}/f")
    key = PartitionKey(fields={"i": IntField(key=5)})
    p = s.generate_partition(key, Fingerprint.empty())
    assert p.path == f"{tmp_path}/05/5/f"
    os.makedirs(os.path.dirname(p.path), exist_ok=True)
    with open(p.path, "w") as f:
        f.write("x")
    parts = s.discover_partitions({"i": IntField})
    assert len(parts) == 1
    assert parts[0].partition_key == key


def test_discover_dot_leading_segment(tmp_path):
    # A StringField value like ".hidden" renders a dot-leading segment;
    # discovery must still see it (glob include_hidden).
    s = _storage(tmp_path, "{s.value}/f")
    key = PartitionKey(fields={"s": StringField(key=".hidden")})
    p = s.generate_partition(key, Fingerprint.empty())
    os.makedirs(os.path.dirname(p.path), exist_ok=True)
    with open(p.path, "w") as f:
        f.write("x")
    parts = s.discover_partitions({"s": StringField})
    assert len(parts) == 1
    assert parts[0].partition_key == key


def test_discover_key_name_with_double_underscore(tmp_path):
    # "__" in a partition-field NAME must not collide with the internal
    # k_<name>__<component> group separator: generated data must be
    # discoverable, not silently invisible.
    s = _storage(tmp_path, "{user__id.value}/f")
    key = PartitionKey(fields={"user__id": IntField(key=7)})
    p = s.generate_partition(key, Fingerprint.empty())
    os.makedirs(os.path.dirname(p.path), exist_ok=True)
    with open(p.path, "w") as f:
        f.write("x")
    parts = s.discover_partitions({"user__id": IntField})
    assert len(parts) == 1
    assert parts[0].partition_key == key


def test_date_value_numeric_spec_is_not_strftime(tmp_path):
    # A numeric spec on {date.value} (copying the int idiom) must NOT be
    # interpreted as strftime by date.__format__ — before the isoformat
    # coercion, "{date.value:02}" rendered the literal segment "02" for
    # EVERY key, collapsing all partitions onto one path.
    s = _storage(tmp_path, "{date.value:02}/f")
    key = PartitionKey(fields={"date": DateField(key=datetime.date(2021, 3, 4))})
    p = s.generate_partition(key, Fingerprint.empty())
    assert p.path == f"{tmp_path}/2021-03-04/f"


def test_date_value_renders_iso(tmp_path):
    s = _storage(tmp_path, "{date.value}/f")
    key = PartitionKey(fields={"date": DateField(key=datetime.date(2021, 3, 4))})
    p = s.generate_partition(key, Fingerprint.empty())
    assert p.path == f"{tmp_path}/2021-03-04/f"
