"""o5m codec unit vectors ported from the reference (FIXTURES.md §5)."""

import numpy as np
import pytest

from skyway_ray.functions.o5m import (
    StringTable, convert_number, convert_string, convert_tag, convert_user,
)


class TestVarint:
    # /root/reference/src/writers/o5m.rs:244-261
    def test_reference_vectors(self):
        assert convert_number(5) == bytes([0x05])
        assert convert_number(127) == bytes([0x7F])
        assert convert_number(323) == bytes([0xC3, 0x02])
        assert convert_number(16384) == bytes([0x80, 0x80, 0x01])

    def test_zero_and_negative(self):
        assert convert_number(0) == b""
        with pytest.raises(ValueError):
            convert_number(-1)


class TestStrings:
    # /root/reference/src/writers/o5m.rs:226-243
    def test_convert_string(self):
        assert convert_string("hello") == b"\x00hello\x00"

    def test_convert_tag(self):
        assert convert_tag("highway", "residential") == \
            b"\x00highway\x00residential\x00"

    def test_convert_user(self):
        # o5m.rs:262-267 shape: 0x00, uid varint, 0x00, name, 0x00
        out = convert_user(5, "abc")
        assert out == b"\x00\x05\x00abc\x00"


class TestStringTable:
    # /root/reference/src/writers/o5m.rs:269-291
    def test_hit_miss_semantics(self):
        st = StringTable()
        a = convert_tag("a", "1")
        b = convert_tag("b", "2")
        assert st.hit_cache(a) == a            # miss: raw bytes
        assert st.hit_cache(a) == bytes([1])   # hit: index 1
        assert st.hit_cache(b) == b            # miss
        assert st.hit_cache(b) == bytes([1])   # now most recent
        assert st.hit_cache(a) == bytes([2])   # pushed back

    def test_truncation(self):
        st = StringTable(capacity=3)
        items = [convert_tag(str(i), "v") for i in range(5)]
        for it in items:
            st.hit_cache(it)
        # oldest two evicted
        assert st.hit_cache(items[0]) == items[0]  # miss again


class TestSortForO5m:
    def test_global_sort(self, ray_session):
        import ray.data
        from skyway_ray.fixtures import make_osm_elements
        from skyway_ray.functions.o5m import sort_elements_for_o5m

        ds = ray.data.from_arrow(make_osm_elements(2000)).repartition(8)
        out = sort_elements_for_o5m(ds).to_pandas()
        ranks = out["type_rank"].to_numpy()
        assert (np.diff(ranks) >= 0).all()
        for r in (0, 1, 2):
            ids = out[out["type_rank"] == r]["id"].to_numpy()
            assert (np.diff(ids) > 0).all()
